"""HTML → markdown flattening (SURVEY §2.E1-E3) as an Arrow-batched
pandas UDF — the reference's most substantial custom logic
(crawl/crawl.py:164-255), re-implemented from scratch on the stdlib
``html.parser`` (BeautifulSoup is not available here, and a Spark engine
should not depend on it for this).

Semantics (parity targets, cited from the reference):
- pre-order walk over ALL descendants of <body> (whole doc if no body);
  handled tags: h1/h2/h3 → '#'-prefixed, p → cleaned text, ul → '- item'
  per direct <li>, ol → '1. item', table → aligned markdown table,
  br → '' (dropped) — crawl/crawl.py:168-178,185-196;
- nested handled tags are emitted BOTH standalone and inside their
  ancestor's text (descendant-walk behavior, crawl.py:185);
- cleaned text = whitespace-normalized get_text (crawl.py:198-199);
- table cells: <br> becomes a space, dash runs '-{2,}' removed, ragged
  rows right-padded with '', columns left-justified to max width, header
  row + '|-…-|' separator — crawl.py:207-255;
- blocks joined by blank lines, empty blocks dropped (crawl.py:196).

Golden sample of the output shape: crawl/1/tvpl/test.md.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

VOID_ELEMENTS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)
# tags whose open instance is implicitly closed by a sibling opener
_AUTO_CLOSE = {
    "li": {"li"},
    "p": {"p"},
    "td": {"td", "th", "tr"},
    "th": {"td", "th", "tr"},
    "tr": {"tr"},
}


class Node:
    __slots__ = ("name", "children", "parent")

    def __init__(self, name: str, parent: "Node | None" = None):
        self.name = name
        self.children: list[Node | str] = []
        self.parent = parent

    # -- traversal -------------------------------------------------------
    def descendants(self):
        for child in self.children:
            yield child
            if isinstance(child, Node):
                yield from child.descendants()

    def get_text(self) -> str:
        parts: list[str] = []
        for d in self.descendants():
            if isinstance(d, str):
                parts.append(d)
        return "".join(parts)

    def find_all(self, names: set[str], recursive: bool = True):
        source = self.descendants() if recursive else iter(self.children)
        for child in source:
            if isinstance(child, Node) and child.name in names:
                yield child


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Node("[document]")
        self.stack = [self.root]

    def _open_names(self) -> list[str]:
        return [n.name for n in self.stack]

    def handle_starttag(self, tag: str, attrs) -> None:
        # implicit close: a new <li>/<td>/<tr>/<p> closes an open sibling
        for open_tag, closers in _AUTO_CLOSE.items():
            if tag in closers:
                for i in range(len(self.stack) - 1, 0, -1):
                    name = self.stack[i].name
                    if name == open_tag:
                        del self.stack[i:]
                        break
                    if name not in ("li", "p", "td", "th", "tr"):
                        break
        node = Node(tag, self.stack[-1])
        self.stack[-1].children.append(node)
        if tag not in VOID_ELEMENTS:
            self.stack.append(node)

    def handle_startendtag(self, tag: str, attrs) -> None:
        self.stack[-1].children.append(Node(tag, self.stack[-1]))

    def handle_endtag(self, tag: str) -> None:
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].name == tag:
                del self.stack[i:]
                return
        # unmatched end tag: ignored (lenient, like html.parser builders)

    def handle_data(self, data: str) -> None:
        if data:
            self.stack[-1].children.append(data)


def parse_html(html: str) -> Node:
    b = _TreeBuilder()
    b.feed(html)
    b.close()
    return b.root


# ---------------------------------------------------------------------------
# Markdown flattening
# ---------------------------------------------------------------------------


def _clean(text: str) -> str:
    return " ".join(text.split())


def _text_with_br(node: Node) -> str:
    parts: list[str] = []
    for d in node.descendants():
        if isinstance(d, Node) and d.name == "br":
            parts.append("\n")
        elif isinstance(d, str):
            parts.append(d)
    return "".join(parts).strip()


def _handle_table(table: Node) -> list[str]:
    rows: list[list[str]] = []
    for tr in table.find_all({"tr"}):
        row: list[str] = []
        for cell in tr.find_all({"th", "td"}):
            cell_text = _text_with_br(cell)
            cell_text = " ".join(
                line.strip() for line in cell_text.split("\n") if line.strip()
            )
            cell_text = re.sub(r"-{2,}", "", cell_text)
            row.append(cell_text)
        if row:
            rows.append(row)
    if not rows or not rows[0]:
        return []
    max_cols = max(len(r) for r in rows)
    rows = [r + [""] * (max_cols - len(r)) for r in rows]
    widths = [max(len(cell) for cell in col) for col in zip(*rows)]

    def fmt(row: list[str]) -> str:
        return "| " + " | ".join(cell.ljust(widths[i]) for i, cell in enumerate(row)) + " |"

    sep = "|-" + "-|-".join("-" * w for w in widths) + "-|"
    return [fmt(rows[0]), sep, *[fmt(r) for r in rows[1:]]]


def html_to_markdown(html: str | None) -> str | None:
    """Flatten one HTML document to markdown (pure Python, used inside the
    Arrow batch kernel below and directly unit-testable)."""
    if html is None:
        return None
    root = parse_html(html)
    body = next(iter(root.find_all({"body"})), None) or root
    blocks: list[str] = []
    for el in body.descendants():
        if not isinstance(el, Node):
            continue
        name = el.name
        if name in ("h1", "h2", "h3"):
            blocks.append(f"{'#' * int(name[1])} {_clean(el.get_text())}")
        elif name == "p":
            blocks.append(_clean(el.get_text()))
        elif name == "ul":
            blocks.extend(
                f"- {_clean(li.get_text())}" for li in el.find_all({"li"}, recursive=False)
            )
        elif name == "ol":
            blocks.extend(
                f"{i + 1}. {_clean(li.get_text())}"
                for i, li in enumerate(el.find_all({"li"}, recursive=False))
            )
        elif name == "table":
            blocks.extend(_handle_table(el))
        # br at top level contributes nothing (reference maps it to "")
    return "\n\n".join(b for b in blocks if b)


@pandas_udf(StringType())
def html_to_markdown_udf(html: pd.Series) -> pd.Series:
    """Arrow-vectorized batch wrapper — the Spark-facing surface."""
    return html.map(html_to_markdown)
