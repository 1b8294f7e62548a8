"""Dependency-free docs build: render docs/*.md to a static HTML site.

The reference ships a Sphinx/ReadTheDocs build (docs/source/conf.py,
contents.rst). This environment has no Sphinx/myst/mkdocs and no package
installs, so the framework's doc build is a stdlib-only renderer for the
markdown subset these docs use — headings, fenced code, inline code, tables,
lists, links, bold/italics — plus an index page linking every document and
the JSON artifacts.

    python docs/build.py            # writes docs/_build/*.html
    python -m http.server -d docs/_build
"""

from __future__ import annotations

import html
import json
import os
import re
import sys

DOCS = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(DOCS, "_build")

_PAGE = """<!doctype html>
<html><head><meta charset="utf-8">
<title>{title} — gym_craftingworld_tpu</title>
<style>
body {{ font: 15px/1.55 system-ui, sans-serif; max-width: 54rem;
       margin: 2rem auto; padding: 0 1rem; color: #1a202c; }}
code {{ background: #f1f5f9; padding: .1em .3em; border-radius: 3px;
        font-size: .92em; }}
pre {{ background: #0f172a; color: #e2e8f0; padding: .8rem 1rem;
       border-radius: 6px; overflow-x: auto; }}
pre code {{ background: none; padding: 0; color: inherit; }}
table {{ border-collapse: collapse; margin: 1rem 0; }}
th, td {{ border: 1px solid #cbd5e1; padding: .35rem .6rem;
          text-align: left; }}
th {{ background: #f8fafc; }}
a {{ color: #1d4ed8; }}
nav {{ margin-bottom: 1.5rem; font-size: .9em; }}
</style></head><body>
<nav><a href="index.html">gym_craftingworld_tpu docs</a></nav>
{body}
</body></html>
"""


def _inline(s: str) -> str:
    s = html.escape(s, quote=False)
    s = re.sub(r"`([^`]+)`", r"<code>\1</code>", s)
    s = re.sub(r"\*\*([^*]+)\*\*", r"<strong>\1</strong>", s)
    s = re.sub(r"(?<!\*)\*([^*\s][^*]*)\*(?!\*)", r"<em>\1</em>", s)
    s = re.sub(
        r"\[([^\]]+)\]\(([^)\s]+)\)",
        lambda m: '<a href="%s">%s</a>'
        % (re.sub(r"\.md$", ".html", m.group(2)), m.group(1)),
        s,
    )
    return s


def render(md: str) -> str:
    lines = md.split("\n")
    out: list[str] = []
    i = 0
    in_list = False

    def close_list():
        nonlocal in_list
        if in_list:
            out.append("</ul>")
            in_list = False

    while i < len(lines):
        line = lines[i]
        if line.startswith("```"):
            close_list()
            block = []
            i += 1
            while i < len(lines) and not lines[i].startswith("```"):
                block.append(lines[i])
                i += 1
            out.append("<pre><code>%s</code></pre>"
                       % html.escape("\n".join(block)))
            i += 1
            continue
        m = re.match(r"^(#{1,4})\s+(.*)", line)
        if m:
            close_list()
            n = len(m.group(1))
            out.append(f"<h{n}>{_inline(m.group(2))}</h{n}>")
            i += 1
            continue
        if line.startswith("|"):
            close_list()
            rows = []
            while i < len(lines) and lines[i].startswith("|"):
                cells = [c.strip() for c in lines[i].strip("|").split("|")]
                rows.append(cells)
                i += 1
            out.append("<table>")
            header_done = False
            for r_i, cells in enumerate(rows):
                if all(re.fullmatch(r":?-{2,}:?", c or "-") for c in cells):
                    header_done = True
                    continue
                tag = "td" if header_done or r_i > 0 else "th"
                out.append(
                    "<tr>"
                    + "".join(f"<{tag}>{_inline(c)}</{tag}>" for c in cells)
                    + "</tr>"
                )
            out.append("</table>")
            continue
        m = re.match(r"^[-*]\s+(.*)", line)
        if m:
            if not in_list:
                out.append("<ul>")
                in_list = True
            item = [m.group(1)]
            i += 1
            while i < len(lines) and re.match(r"^\s{2,}\S", lines[i]):
                item.append(lines[i].strip())
                i += 1
            out.append(f"<li>{_inline(' '.join(item))}</li>")
            continue
        m = re.match(r"^(\d+)\.\s+(.*)", line)
        if m:
            close_list()
            item = [m.group(2)]
            i += 1
            while i < len(lines) and re.match(r"^\s{2,}\S", lines[i]):
                item.append(lines[i].strip())
                i += 1
            out.append(f"<p>{m.group(1)}. {_inline(' '.join(item))}</p>")
            continue
        if not line.strip():
            close_list()
            i += 1
            continue
        para = [line]
        i += 1
        while i < len(lines) and lines[i].strip() and not re.match(
            r"^(#|```|\||[-*]\s|\d+\.\s)", lines[i]
        ):
            para.append(lines[i])
            i += 1
        out.append(f"<p>{_inline(' '.join(para))}</p>")
    close_list()
    return "\n".join(out)


def main() -> int:
    os.makedirs(OUT, exist_ok=True)
    pages = []
    sources = sorted(f for f in os.listdir(DOCS) if f.endswith(".md"))
    for fname in sources:
        with open(os.path.join(DOCS, fname)) as f:
            md = f.read()
        title = next(
            (ln.lstrip("# ").strip() for ln in md.split("\n")
             if ln.startswith("#")),
            fname,
        )
        body = render(md)
        out_name = fname[:-3] + ".html"
        with open(os.path.join(OUT, out_name), "w") as f:
            f.write(_PAGE.format(title=html.escape(title), body=body))
        pages.append((out_name, title))

    artifacts = sorted(f for f in os.listdir(DOCS) if f.endswith(".json"))
    idx = ["<h1>gym_craftingworld_tpu documentation</h1>", "<ul>"]
    for out_name, title in pages:
        if out_name != "index.html":
            idx.append(f'<li><a href="{out_name}">{html.escape(title)}</a></li>')
    idx.append("</ul><h2>Recorded artifacts</h2><table>")
    idx.append("<tr><th>artifact</th><th>headline value</th></tr>")
    for a in artifacts:
        try:
            with open(os.path.join(DOCS, a)) as f:
                d = json.load(f)
            head = next(
                (f"{k} = {d[k]}" for k in
                 ("success_rate", "pair_mean", "within_noise",
                  "full_loop_env_steps_per_s") if k in d),
                f"{len(json.dumps(d))} bytes",
            )
        except Exception:
            head = "unreadable"
        idx.append(f"<tr><td><code>{a}</code></td><td>{html.escape(str(head))}"
                   "</td></tr>")
    idx.append("</table>")
    with open(os.path.join(OUT, "index.html"), "w") as f:
        f.write(_PAGE.format(title="index", body="\n".join(idx)))
    print(f"built {len(pages)} pages + index → {OUT}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
