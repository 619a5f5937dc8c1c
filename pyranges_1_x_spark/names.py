"""Column-name contract for the engine.

Mirrors the reference's contract (``/root/reference/pyranges1/core/names.py:41-77``):
the genomic-location columns are fixed literal names; everything else is free-form
metadata carried through every operator untouched.

Coordinates are 0-based half-open ``[Start, End)`` (LongType).
"""

from __future__ import annotations

CHROM_COL = "Chromosome"
START_COL = "Start"
END_COL = "End"
STRAND_COL = "Strand"

GENOME_LOC_COLS = [CHROM_COL, START_COL, END_COL]
GENOME_LOC_COLS_WITH_STRAND = [*GENOME_LOC_COLS, STRAND_COL]

#: Valid genomic strands (reference: core/names.py:53-56).
VALID_GENOMIC_STRANDS = ("+", "-")

#: Default suffix for colliding columns of the right frame in joins.
JOIN_SUFFIX = "_b"

#: Strand behaviors for binary ops (reference: core/names.py:65-77).
STRAND_BEHAVIOR_AUTO = "auto"
STRAND_BEHAVIOR_SAME = "same"
STRAND_BEHAVIOR_OPPOSITE = "opposite"
STRAND_BEHAVIOR_IGNORE = "ignore"
VALID_STRAND_BEHAVIOR = (
    STRAND_BEHAVIOR_AUTO,
    STRAND_BEHAVIOR_SAME,
    STRAND_BEHAVIOR_OPPOSITE,
    STRAND_BEHAVIOR_IGNORE,
)

#: 'multiple' overlap reporting modes (reference: range_frame.py:539-607).
OVERLAP_ALL = "all"
OVERLAP_FIRST = "first"
OVERLAP_LAST = "last"
VALID_OVERLAP_MODES = (OVERLAP_ALL, OVERLAP_FIRST, OVERLAP_LAST)

#: Join types for join_overlaps (reference: methods/join.py:13-71).
VALID_JOIN_TYPES = ("inner", "left", "right", "outer")

#: Nearest directions (reference: range_frame.py:451-537).
NEAREST_ANY = "any"
NEAREST_FORWARD = "forward"
NEAREST_BACKWARD = "backward"
NEAREST_UPSTREAM = "upstream"
NEAREST_DOWNSTREAM = "downstream"

#: Internal helper column names (never leak into user-visible output).
ROW_ID_COL = "__row_id__"
BIN_COL = "__bin__"
ISLAND_COL = "__island__"

#: Default bin width for the binned interval join (see plans/interval_join.py).
#: ~100kb works well for genomic interval lengths (reads/exons are << 100kb),
#: keeping the explode factor ~1 while bounding per-(key,bin) partition size.
DEFAULT_BIN_SIZE = 100_000
