"""Fixed-width console formatting for the CLI's get/list output
(reference ``client/src/featureform/format.py:8-53``: the 30-char
column spacings and section dividers its get.py/list.py print with)."""

from __future__ import annotations

import sys

_SPACING = {
    2: "{:<30} {:<25}",
    3: "{:<30} {:<30} {:<30}",
    4: "{:<30} {:<30} {:<30} {:<30}",
    5: "{:<30} {:<30} {:<30} {:<30} {:<30}",
}
DIVIDER = "-----------------------------------------------"


def format_rows(*cols, out=None) -> None:
    """Print one fixed-width row; with a single list argument, print
    each of its tuples as a row (reference format_rows semantics)."""
    out = out or sys.stdout
    if len(cols) == 1 and isinstance(cols[0], str):
        print(cols[0], file=out)
        return
    if len(cols) == 1:
        for row in cols[0]:
            format_rows(*row, out=out)
        return
    vals = ["" if c is None else str(c) for c in cols]
    print(_SPACING[min(len(vals), 5)].format(*vals[:5]), file=out)


def format_pg(title: str = "", out=None) -> None:
    """Section divider + heading (reference format_pg).  The title line
    prints even when empty — the reference's ``print(s)`` emits a blank
    line, and downstream output diffs cleanly only if we do too."""
    out = out or sys.stdout
    print(DIVIDER, file=out)
    print(title, file=out)
