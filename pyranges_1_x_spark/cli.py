"""Pipeline CLI — the reference ``pyranger`` chain re-expressed on Spark.

Reference: ``cli.py:94-208``. Same grammar: argv split on literal ``,`` into
segments; the first segment is an unnamed reader, later ``name=reader path``
segments register named frames, remaining segments are method calls on the
current frame (``--flag value`` / ``--flag=value`` keywords, positional
tokens literal-cast, registry names substituted). The whole chain builds ONE
lazy Catalyst plan; nothing executes until the final preview/count.

    python -m pyranges_1_x_spark read_bed a.bed , other=read_bed b.bed \
        , join_overlaps other --strand_behavior ignore , merge_overlaps
"""

from __future__ import annotations

import ast
import sys

from pyranges_1_x_spark.core import GenomicRanges


def cast_literal(tok: str):
    """Literal-cast a CLI token (reference cli.py:cast_literal): int/float/
    bool/None/quoted literals, else the raw string."""
    try:
        return ast.literal_eval(tok)
    except (ValueError, SyntaxError):
        return tok


def _readers(spark):
    from pyranges_1_x_spark.sources import bed, binary, gtf, synthetic

    return {
        "read_bed": lambda path, **kw: bed.read_bed(spark, path, **kw),
        "read_gtf": lambda path, **kw: gtf.read_gtf(spark, path, **kw),
        "read_gff3": lambda path, **kw: gtf.read_gff3(spark, path, **kw),
        "read_bam": lambda path, **kw: binary.read_bam(spark, path, **kw),
        "read_bigwig": lambda path, **kw: binary.read_bigwig(spark, path, **kw),
        "read_parquet": lambda path: GenomicRanges.wrap(spark.read.parquet(path)),
        "from_string": lambda s: synthetic.from_string(spark, s),
    }


def _split_segments(args: list[str]) -> list[list[str]]:
    segments, buf = [], []
    for tok in args:
        if tok == ",":
            if not buf:
                sys.exit("Error: empty segment before comma")
            segments.append(buf)
            buf = []
        else:
            buf.append(tok)
    if buf:
        segments.append(buf)
    return segments


def _parse_call(method_args: list[str], registry: dict):
    pos, flags, i = [], {}, 0
    while i < len(method_args):
        tok = method_args[i]
        if tok.startswith("--"):
            if "=" in tok:
                k, v = tok[2:].split("=", 1)
                flags[k] = cast_literal(v)
                i += 1
            elif i + 1 < len(method_args) and not method_args[i + 1].startswith("--"):
                flags[tok[2:]] = cast_literal(method_args[i + 1])
                i += 2
            else:
                flags[tok[2:]] = True
                i += 1
        else:
            pos.append(registry[tok] if tok in registry else cast_literal(tok))
            i += 1
    return pos, flags


def main(argv: list[str] | None = None, spark=None, n_preview: int = 20) -> int:
    args = sys.argv[1:] if argv is None else argv
    if not args or args[0] in ("-h", "--help"):
        sys.stdout.write(__doc__ + "\n")
        return 0

    if spark is None:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[*]")
            .appName("pyranges_1_x_spark-cli")
            .config("spark.sql.adaptive.enabled", "true")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")

    readers = _readers(spark)
    segments = _split_segments(args)

    head0 = segments[0][0]
    if "=" in head0 or head0 not in readers:
        sys.exit(f"Error: the first segment must be an unnamed reader ({', '.join(readers)})")
    primary = readers[head0](*[cast_literal(t) for t in segments[0][1:]])
    registry = {"pr": primary}

    n_readers = 1
    for seg in segments[1:]:
        head = seg[0]
        if "=" in head:
            var, cmd = head.split("=", 1)
            if cmd not in readers:
                break
            registry[var] = readers[cmd](*[cast_literal(t) for t in seg[1:]])
            n_readers += 1
        else:
            break

    for seg in segments[n_readers:]:
        head = seg[0]
        fn = getattr(primary, head, None)
        if fn is None:
            sys.exit(f"Error: unknown method '{head}' on GenomicRanges")
        pos, flags = _parse_call(seg[1:], registry)
        primary = fn(*pos, **flags)
        registry["pr"] = primary

    df = primary.df if isinstance(primary, GenomicRanges) else primary
    if hasattr(df, "show"):
        df.show(n_preview, truncate=False)
        sys.stdout.write(f"[{df.count()} rows]\n")
    else:
        sys.stdout.write(str(df) + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
