"""SURVEY.md §2 is the machine-checkable coverage contract — every row
must live in a well-formed markdown table (header + separator + uniform
column count). Orphan header-less blocks regressed twice (VERDICT r6
task 8, r7 task 5); this lint keeps the repair permanent."""

from __future__ import annotations

import re
from pathlib import Path

SURVEY = Path(__file__).resolve().parents[1] / "SURVEY.md"


def _table_blocks(lines: list[str]) -> list[list[str]]:
    blocks, cur = [], []
    for ln in lines:
        if ln.lstrip().startswith("|"):
            cur.append(ln.rstrip())
        elif cur:
            blocks.append(cur)
            cur = []
    if cur:
        blocks.append(cur)
    return blocks


def _ncols(row: str) -> int:
    # cells between the outer pipes; '\|' is escaped content, not a delimiter
    return len(re.split(r"(?<!\\)\|", row.strip().strip("|")))


def test_every_section2_table_is_well_formed():
    text = SURVEY.read_text()
    m = re.search(r"^## (?:§)?2\b.*?$", text, re.M)
    assert m, "SURVEY.md lost its §2 heading"
    start = m.start()
    nxt = re.search(r"^## (?:§)?3\b", text[m.end():], re.M)
    section = text[start : m.end() + (nxt.start() if nxt else len(text))]
    blocks = _table_blocks(section.splitlines())
    assert blocks, "§2 carries no tables"
    for b in blocks:
        assert len(b) >= 3, f"table fragment too short: {b[0][:80]}"
        sep = b[1].strip().strip("|")
        assert re.fullmatch(r"[-: |]+", sep), (
            f"second line is not a header separator (orphan block?): "
            f"{b[0][:80]!r} / {b[1][:80]!r}"
        )
        widths = {_ncols(r) for r in b}
        assert len(widths) == 1, (
            f"ragged table starting {b[0][:80]!r}: column counts {widths}"
        )


def test_llm_subsection_is_one_table():
    lines = SURVEY.read_text().splitlines()
    start = next(
        i for i, l in enumerate(lines) if l.startswith("#### LLM-data-pipeline")
    )
    end = next(i for i, l in enumerate(lines) if l.startswith("### 2.3"))
    blocks = _table_blocks(lines[start:end])
    assert len(blocks) == 1, f"{len(blocks)} orphan blocks in the LLM subsection"
