"""NCBI genetic-code translation tables (parity: reference ext/seqs.py:12-51).

The 25 NCBI tables are public data — each is the canonical 64-character
amino-acid string over codons enumerated in TCAG-major order (TTT, TTC, TTA,
TTG, TCT, ... GGG), as published at
https://www.ncbi.nlm.nih.gov/Taxonomy/Utils/wprintgc.cgi. Codon dicts are
derived at import; every table also gets a ``"<id>+U"`` variant where the
TGA stop recodes to selenocysteine (U), and the gap codon ``---`` maps to
``-`` — matching the reference's table grammar so ``translate_cds``/
``extend_orfs`` callers can name any table the reference accepts.
"""

from __future__ import annotations

from itertools import product

#: 64 amino acids per NCBI table id, codons in TCAG-major order.
_NCBI_AAS = {
    "1": "FFLLSSSSYY**CC*WLLLLPPPPHHQQRRRRIIIMTTTTNNKKSSRRVVVVAAAADDEEGGGG",
    "2": "FFLLSSSSYY**CCWWLLLLPPPPHHQQRRRRIIMMTTTTNNKKSS**VVVVAAAADDEEGGGG",
    "3": "FFLLSSSSYY**CCWWTTTTPPPPHHQQRRRRIIMMTTTTNNKKSSRRVVVVAAAADDEEGGGG",
    "4": "FFLLSSSSYY**CCWWLLLLPPPPHHQQRRRRIIIMTTTTNNKKSSRRVVVVAAAADDEEGGGG",
    "5": "FFLLSSSSYY**CCWWLLLLPPPPHHQQRRRRIIMMTTTTNNKKSSSSVVVVAAAADDEEGGGG",
    "6": "FFLLSSSSYYQQCC*WLLLLPPPPHHQQRRRRIIIMTTTTNNKKSSRRVVVVAAAADDEEGGGG",
    "9": "FFLLSSSSYY**CCWWLLLLPPPPHHQQRRRRIIIMTTTTNNNKSSSSVVVVAAAADDEEGGGG",
    "10": "FFLLSSSSYY**CCCWLLLLPPPPHHQQRRRRIIIMTTTTNNKKSSRRVVVVAAAADDEEGGGG",
    "11": "FFLLSSSSYY**CC*WLLLLPPPPHHQQRRRRIIIMTTTTNNKKSSRRVVVVAAAADDEEGGGG",
    "12": "FFLLSSSSYY**CC*WLLLSPPPPHHQQRRRRIIIMTTTTNNKKSSRRVVVVAAAADDEEGGGG",
    "13": "FFLLSSSSYY**CCWWLLLLPPPPHHQQRRRRIIMMTTTTNNKKSSGGVVVVAAAADDEEGGGG",
    "14": "FFLLSSSSYYY*CCWWLLLLPPPPHHQQRRRRIIIMTTTTNNNKSSSSVVVVAAAADDEEGGGG",
    "16": "FFLLSSSSYY*LCC*WLLLLPPPPHHQQRRRRIIIMTTTTNNKKSSRRVVVVAAAADDEEGGGG",
    "21": "FFLLSSSSYY**CCWWLLLLPPPPHHQQRRRRIIMMTTTTNNNKSSSSVVVVAAAADDEEGGGG",
    "22": "FFLLSS*SYY*LCC*WLLLLPPPPHHQQRRRRIIIMTTTTNNKKSSRRVVVVAAAADDEEGGGG",
    "23": "FF*LSSSSYY**CC*WLLLLPPPPHHQQRRRRIIIMTTTTNNKKSSRRVVVVAAAADDEEGGGG",
    "24": "FFLLSSSSYY**CCWWLLLLPPPPHHQQRRRRIIIMTTTTNNKKSSSKVVVVAAAADDEEGGGG",
    "25": "FFLLSSSSYY**CCGWLLLLPPPPHHQQRRRRIIIMTTTTNNKKSSRRVVVVAAAADDEEGGGG",
    "26": "FFLLSSSSYY**CC*WLLLAPPPPHHQQRRRRIIIMTTTTNNKKSSRRVVVVAAAADDEEGGGG",
    "27": "FFLLSSSSYYQQCCWWLLLAPPPPHHQQRRRRIIIMTTTTNNKKSSRRVVVVAAAADDEEGGGG",
    "28": "FFLLSSSSYYQQCCWWLLLAPPPPHHQQRRRRIIIMTTTTNNKKSSRRVVVVAAAADDEEGGGG",
    "29": "FFLLSSSSYYYYCC*WLLLAPPPPHHQQRRRRIIIMTTTTNNKKSSRRVVVVAAAADDEEGGGG",
    "30": "FFLLSSSSYYEECC*WLLLAPPPPHHQQRRRRIIIMTTTTNNKKSSRRVVVVAAAADDEEGGGG",
    "31": "FFLLSSSSYYEECCWWLLLLPPPPHHQQRRRRIIIMTTTTNNKKSSRRVVVVAAAADDEEGGGG",
    "33": "FFLLSSSSYYY*CCWWLLLLPPPPHHQQRRRRIIIMTTTTNNKKSSSKVVVVAAAADDEEGGGG",
}

_CODONS = ["".join(c) for c in product("TCAG", repeat=3)]

#: {table id: {codon: aa}} including the "+U" selenocysteine variants.
GENETIC_CODES: dict[str, dict[str, str]] = {}
for _gc, _aas in _NCBI_AAS.items():
    _table = {"---": "-"}
    _table.update(dict(zip(_CODONS, _aas)))
    GENETIC_CODES[_gc] = _table
    GENETIC_CODES[_gc + "+U"] = {**_table, "TGA": "U"}


def get_genetic_code(code: str | int | dict | None = 1) -> dict[str, str]:
    """Resolve a genetic-code option to a {codon: aa} dict.

    Accepts an NCBI table id as int or str (e.g. 1, "2", "11"), a "+U"
    selenocysteine variant (e.g. "1+U"), or a pre-built dict (passed
    through, so callers can supply fully custom codes)."""
    if code is None:
        code = 1
    if isinstance(code, dict):
        return code
    key = str(code)
    if key not in GENETIC_CODES:
        raise ValueError(
            f"unknown genetic code {code!r}; valid ids: {sorted(_NCBI_AAS)} (each also as '<id>+U')"
        )
    return GENETIC_CODES[key]


def stop_codons(code: str | int | dict | None = 1) -> tuple[str, ...]:
    """The stop codons of a genetic code (codons translating to '*'), in
    TCAG-major order — pluggable into ``extend_orfs(stops=...)`` so ORF
    scans honor alternate tables (e.g. table 2 has AGA/AGG stops, table 6
    only TGA)."""
    table = get_genetic_code(code)
    return tuple(c for c in _CODONS if table.get(c) == "*")
