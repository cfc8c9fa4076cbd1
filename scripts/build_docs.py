#!/usr/bin/env python
"""Build the documentation site (docs/ -> site/).

Counterpart of the reference's mkdocs site (ref mkdocs.yml). Uses
mkdocs when installed; otherwise falls back to a self-contained
markdown -> HTML build (python-markdown if available, else a minimal
renderer), so the docs always build offline.

Usage: python scripts/build_docs.py [--out site]
"""

from __future__ import annotations

import argparse
import html
import re
import shutil
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
DOCS = ROOT / "docs"

PAGES = [
    "index.md",
    "installation.md",
    "getting_started.md",
    "tutorials/matching.md",
    "tutorials/single_epoch_stereo.md",
    "tutorials/multitemporal_4d.md",
    "tpu.md",
    "api.md",
]

_STYLE = """
body { font-family: sans-serif; max-width: 46rem; margin: 2rem auto;
       padding: 0 1rem; line-height: 1.55; color: #222; }
pre { background: #f6f8fa; padding: .8rem; overflow-x: auto;
      border-radius: 6px; font-size: .9em; }
code { background: #f6f8fa; padding: .1em .3em; border-radius: 4px; }
pre code { padding: 0; }
table { border-collapse: collapse; }
td, th { border: 1px solid #ccc; padding: .3em .6em; }
nav a { margin-right: 1em; }
"""


def _minimal_md_to_html(text: str) -> str:
    """Small offline markdown renderer: headings, fences, inline code,
    links, lists, tables, paragraphs. Not general — enough for docs/."""
    out: list[str] = []
    lines = text.splitlines()
    i = 0
    in_list = False
    while i < len(lines):
        line = lines[i]
        if line.startswith("```"):
            block = []
            i += 1
            while i < len(lines) and not lines[i].startswith("```"):
                block.append(lines[i])
                i += 1
            out.append("<pre><code>"
                       + html.escape("\n".join(block))
                       + "</code></pre>")
            i += 1
            continue
        if line.startswith("|") and i + 1 < len(lines) \
                and lines[i + 1].replace("|", "").strip() != "" \
                and set(lines[i + 1].replace("|", "").strip()) <= \
                set("-: "):
            rows = []
            while i < len(lines) and lines[i].startswith("|"):
                rows.append([c.strip() for c in
                             lines[i].strip("|").split("|")])
                i += 1
            head, _, *body = rows
            out.append("<table><tr>" + "".join(
                f"<th>{_inline(c)}</th>" for c in head) + "</tr>")
            for r in body:
                out.append("<tr>" + "".join(
                    f"<td>{_inline(c)}</td>" for c in r) + "</tr>")
            out.append("</table>")
            continue
        m = re.match(r"^(#{1,6})\s+(.*)$", line)
        if m:
            if in_list:
                out.append("</ul>")
                in_list = False
            n = len(m.group(1))
            out.append(f"<h{n}>{_inline(m.group(2))}</h{n}>")
        elif re.match(r"^\s*[-*]\s+", line):
            if not in_list:
                out.append("<ul>")
                in_list = True
            out.append("<li>" + _inline(
                re.sub(r"^\s*[-*]\s+", "", line)) + "</li>")
        elif re.match(r"^\s*\d+\.\s+", line):
            out.append("<p>" + _inline(line.strip()) + "</p>")
        elif line.strip() == "":
            if in_list:
                out.append("</ul>")
                in_list = False
        else:
            out.append(f"<p>{_inline(line)}</p>")
        i += 1
    if in_list:
        out.append("</ul>")
    return "\n".join(out)


def _inline(s: str) -> str:
    s = html.escape(s)
    s = re.sub(r"\*\*(.+?)\*\*", r"<b>\1</b>", s)
    s = re.sub(r"`([^`]+)`", r"<code>\1</code>", s)
    s = re.sub(r"\[([^\]]+)\]\(([^) ]+)\)",
               lambda m: '<a href="{}">{}</a>'.format(
                   m.group(2).replace(".md", ".html"), m.group(1)), s)
    return s


def build_fallback(out_dir: Path) -> None:
    try:
        import markdown as md_mod
    except ImportError:
        md_mod = None

    out_dir.mkdir(parents=True, exist_ok=True)
    nav = " | ".join(
        f'<a href="{Path(p).with_suffix(".html").as_posix()}">'
        f'{Path(p).stem.replace("_", " ")}</a>' for p in PAGES)
    for page in PAGES:
        src = DOCS / page
        text = src.read_text()
        if md_mod is not None:
            body = md_mod.markdown(
                text, extensions=["fenced_code", "tables"])
        else:
            body = _minimal_md_to_html(text)
        # nav links are relative to the site root
        depth = len(Path(page).parts) - 1
        prefix = "../" * depth
        nav_rel = nav.replace('href="', f'href="{prefix}')
        dst = out_dir / Path(page).with_suffix(".html")
        dst.parent.mkdir(parents=True, exist_ok=True)
        dst.write_text(
            "<!DOCTYPE html><html><head><meta charset='utf-8'>"
            f"<title>icepy4d_tpu — {Path(page).stem}</title>"
            f"<style>{_STYLE}</style></head><body>"
            f"<nav>{nav_rel}</nav>\n{body}\n</body></html>")
    print(f"docs built (fallback renderer) -> {out_dir}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=str(ROOT / "site"))
    args = ap.parse_args()
    out_dir = Path(args.out)

    if shutil.which("mkdocs"):
        subprocess.run(["mkdocs", "build", "-d", str(out_dir)],
                       cwd=ROOT, check=True)
        return
    build_fallback(out_dir)


if __name__ == "__main__":
    main()
