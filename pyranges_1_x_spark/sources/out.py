"""CSV writer (reference core/out.py:111-141 ``_to_csv``).

The reference writes one pandas ``to_csv`` per chromosome frame into a single
file, or returns the concatenated CSV text when no path is given. Spark-first
translation:

- with ``path``: a distributed ``df.write.csv`` — one part file per
  partition, the only shape that scales (a single-file write would funnel
  100 TB through one task). Callers needing one file coalesce explicitly.
- without ``path``: the CSV TEXT is returned, which necessarily materializes
  on the driver — mirrored from the reference's return-a-string mode and
  meant for small frames (doctests, notebooks); guarded by a documented
  driver-side collect, never used internally.
"""

from __future__ import annotations

import io

from pyspark.sql import DataFrame


def to_csv(
    df: DataFrame,
    path: str | None = None,
    sep: str = ",",
    *,
    header: bool = True,
    mode: str = "overwrite",
) -> str | None:
    """Write ``df`` as CSV to ``path`` (distributed), or return the CSV text
    (driver-side collect — small frames only) when ``path`` is None."""
    if path is not None:
        df.write.mode(mode).csv(path, sep=sep, header=header)
        return None
    pdf = df.toPandas()
    buf = io.StringIO()
    pdf.to_csv(buf, index=False, header=header, sep=sep)
    return buf.getvalue()
