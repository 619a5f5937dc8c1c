"""Tabular repr for GenomicRanges/RangeFrame — reference ``core/tostring.py``.

Reference behavior reproduced: ``max_rows_to_show`` rows rendered as an
aligned table with a dtype line under each header, per-cell truncation to
``max_col_width``, column-set truncation to the console width (each column
costs its widest cell + 4), a ``(k columns not shown: "x", "y", ...)``
note capped at ``max_column_names_to_show`` names, and a class/shape
footer.

Deliberate deviations for a lazy distributed engine, each load-bearing:

* The default row window is ``take(max_rows_to_show + 1)`` — the FIRST n
  rows plus a one-row probe. The reference shows a head+tail split and an
  exact row count; both require a full scan (``tail``/``len``) that an
  interactive repr must never trigger against 100 TB. When the probe shows
  more rows exist, the table ends with a ``...`` row and the footer
  reports ``more than N rows``; pass ``count_rows=True`` to pay for the
  exact count, or ``tail=True`` to pay for the reference's full head+tail
  split (exact count + last-rows scan).
* ``__repr__`` on the frame classes stays job-free (schema only);
  ``tostring()``/``print(gr.tostring())`` is the explicit opt-in that runs
  the bounded job. A repr that silently submits cluster jobs turns every
  debugger/log statement into a query.
"""

from __future__ import annotations

import shutil


def _console_width(max_total_width: int | None) -> int:
    from pyranges_1_x_spark.options import options

    if max_total_width is not None:
        return max_total_width
    width = options.get_option("console_width")
    return width if width else shutil.get_terminal_size().columns


def _cell(v, max_col_width: int | None) -> str:
    s = "nan" if v is None else str(v)
    if max_col_width is not None and len(s) > max_col_width:
        return s[: max_col_width - 3] + "..."
    return s


def tostring(
    df,
    class_name: str = "GenomicRanges",
    max_col_width: int | None = None,
    max_total_width: int | None = None,
    count_rows: bool = False,
    tail: bool = False,
) -> str:
    """Render a Spark DataFrame as the reference-style bounded table.

    ``tail=True`` opts into the reference's exact head+tail split
    (``core/tostring.py:72-89``: ``head(n//2)`` + ``...`` marker row +
    ``tail(n//2)`` + an exact row count in the footer). It costs two extra
    jobs (a ``count()`` and a ``tail(n//2)``, the latter a full scan of the
    final partition chain) — the default first-``n`` window stays the lazy
    path an interactive repr should take against 100 TB.
    """
    from pyranges_1_x_spark.options import options

    n = options.get_option("max_rows_to_show")
    max_names = options.get_option("max_column_names_to_show")
    width_budget = _console_width(max_total_width)

    headers = list(df.columns)
    dtypes = dict(df.dtypes)

    total: int | None = None
    split_at: int | None = None  # row index before which the "..." row goes
    if tail:
        total = df.count()
        half = n // 2
        if total > n:
            shown = list(df.take(half)) + list(df.tail(half))
            split_at = half
            has_more = True
        else:
            shown = df.take(n)
            has_more = False
    else:
        rows = df.take(n + 1)
        has_more = len(rows) > n
        shown = rows[:n]

    cols = [
        [_cell(h, max_col_width)]
        + [_cell(dtypes[h], max_col_width)]
        + [_cell(r[h], max_col_width) for r in shown]
        for h in headers
    ]
    # Column-set truncation: include columns while cumulative width
    # (widest cell + 4 per column) fits the budget (reference
    # adjust_table_width).
    included = 0
    cum = 0
    for col in cols:
        w = max(len(x) for x in col) + 4
        if cum + w > width_budget:
            break
        cum += w
        included += 1
    included = max(included, 1)

    out_lines = []
    widths = [max(len(x) for x in col) for col in cols[:included]]
    trunc_cols = included < len(headers)

    def fmt(cells: list[str], filler: str = "") -> str:
        parts = [c.ljust(w) for c, w in zip(cells, widths)]
        if trunc_cols:
            parts.append(filler or "...")
        return "  ".join(parts).rstrip()

    out_lines.append(fmt([c[0] for c in cols[:included]]))
    out_lines.append(fmt([c[1] for c in cols[:included]]))
    out_lines.append(fmt(["-" * w for w in widths], "-" * 3))
    for i in range(len(shown)):
        if split_at is not None and i == split_at:
            out_lines.append(fmt(["..." for _ in range(included)]))
        out_lines.append(fmt([c[2 + i] for c in cols[:included]]))
    if has_more and split_at is None:
        out_lines.append(fmt(["..." for _ in range(included)]))

    if total is not None:
        shape0 = f"{total} rows"
    elif count_rows:
        shape0 = f"{df.count()} rows"
    elif has_more:
        # The take(n+1) probe already saw row n+1, so the tight observed
        # bound is "more than n", not "at least n".
        shape0 = f"more than {n} rows (lazy; first {n} shown)"
    else:
        shape0 = f"{len(shown)} rows"
    footer = f"{class_name} with {shape0} and {len(headers)} columns."
    if trunc_cols:
        hidden = headers[included:]
        names = [f'"{h}"' for h in hidden[:max_names]]
        if len(hidden) > max_names:
            names.append("...")
        footer += (
            f" ({len(hidden)} columns not shown: {', '.join(names)})."
        )
    return "\n".join([*out_lines, footer])


def to_html(df, class_name: str = "GenomicRanges") -> str:
    """HTML table repr (Jupyter), honoring the reference's ``html_max_rows``
    (falling back to ``max_rows_to_show``) and ``html_max_cols`` options —
    the same ``take(n+1)`` lazy bound as ``tostring``."""
    import html as _html

    from pyranges_1_x_spark.options import options

    n = options.get_option("html_max_rows") or options.get_option(
        "max_rows_to_show"
    )
    max_cols = options.get_option("html_max_cols")
    rows = df.take(n + 1)
    has_more = len(rows) > n
    shown = rows[:n]
    headers = list(df.columns)
    vis = headers if max_cols is None else headers[:max_cols]
    trunc_cols = len(vis) < len(headers)

    def esc(v) -> str:
        return _html.escape("nan" if v is None else str(v))

    dtypes = dict(df.dtypes)
    parts = ["<table border='1'>", "<thead><tr>"]
    parts += [f"<th>{esc(h)}<br/><em>{esc(dtypes[h])}</em></th>" for h in vis]
    if trunc_cols:
        parts.append("<th>...</th>")
    parts.append("</tr></thead><tbody>")
    for r in shown:
        cells = "".join(f"<td>{esc(r[h])}</td>" for h in vis)
        parts.append(f"<tr>{cells}{'<td>...</td>' if trunc_cols else ''}</tr>")
    if has_more:
        pad = len(vis) + (1 if trunc_cols else 0)
        parts.append("<tr>" + "<td>...</td>" * pad + "</tr>")
    parts.append("</tbody></table>")
    shape0 = (
        f"more than {n} rows (lazy; first {n} shown)" if has_more
        else f"{len(shown)} rows"
    )
    note = f" ({len(headers) - len(vis)} columns hidden)" if trunc_cols else ""
    parts.append(
        f"<p>{esc(class_name)} with {shape0} and {len(headers)} columns{note}.</p>"
    )
    return "".join(parts)
