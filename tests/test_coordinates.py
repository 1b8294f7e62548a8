"""Coord utility parity with the reference class (coordinates.py:6-43)."""

from gym_craftingworld_tpu.utils.coordinates import Coord


def test_clamped_arithmetic():
    a = Coord(0, 0, 4, 4)
    up = Coord(-1, 0)
    assert (a + up).tuple() == (0, 0)  # clamped at edge
    b = Coord(2, 3, 4, 4)
    assert (b + Coord(1, 1)).tuple() == (3, 4)
    assert (b + Coord(10, 10)).tuple() == (4, 4)
    assert (b - Coord(10, 10)).tuple() == (0, 0)


def test_equality_and_str():
    assert Coord(1, 2) == Coord(1, 2, 99, 99)
    assert Coord(1, 2) != Coord(2, 1)
    assert Coord(1, 2) != "notacoord"
    assert str(Coord(3, 4)) == "(3, 4)"
    assert hash(Coord(1, 2)) == hash(Coord(1, 2, 7, 7))
