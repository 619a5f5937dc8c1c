"""Prototype: DuckDB SQL twin of bpe_train + bpe_apply (r14 bpe_segment gate).

Validates the unrolled-K-round SQL trainer + final-state segmentation against
a pure-Python reference of the Spark trainer's semantics on a toy corpus.
"""

from __future__ import annotations

import hashlib
import re
import sys

DUCK_PAT = (
    "'''(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+'"
)
PY_PAT = r"'(?:s|t|re|ve|m|ll|d)| ?[^\W\d_]+| ?\d+| ?(?:[^\s\w]|_)+|\s+"


def py_train(texts: list[str], n_merges: int) -> list[tuple[str, str]]:
    pat = re.compile(PY_PAT)
    words: dict[tuple[str, ...], int] = {}
    for t in texts:
        for p in pat.findall(t):
            k = tuple(p)
            words[k] = words.get(k, 0) + 1
    words2 = dict(words)
    merges = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, n in words2.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + n
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        (lhs, rhs), c = best
        if c < 1:
            break
        merges.append((lhs, rhs))
        new = {}
        for syms, n in words2.items():
            out: list[str] = []
            for s in syms:
                if out and out[-1] == lhs and s == rhs:
                    out[-1] = lhs + rhs
                else:
                    out.append(s)
            k = tuple(out)
            new[k] = new.get(k, 0) + n
        words2 = new
    return merges


def py_segment(texts, ids, merges):
    pat = re.compile(PY_PAT)
    ranks = {m: i for i, m in enumerate(merges)}
    res = {}
    for i, t in zip(ids, texts):
        toks: list[str] = []
        for p in pat.findall(t):
            syms = list(p)
            while len(syms) >= 2:
                cand = [
                    (ranks[pr], j)
                    for j, pr in enumerate(zip(syms, syms[1:]))
                    if pr in ranks
                ]
                if not cand:
                    break
                rk = min(c[0] for c in cand)
                lhs, rhs = merges[rk]
                out, j = [], 0
                while j < len(syms):
                    if j + 1 < len(syms) and syms[j] == lhs and syms[j + 1] == rhs:
                        out.append(lhs + rhs)
                        j += 2
                    else:
                        out.append(syms[j])
                        j += 1
                syms = out
            toks.extend(syms)
        res[i] = (
            len(toks),
            hashlib.md5("\x1f".join(toks).encode()).hexdigest(),
        )
    return res


def duck_bpe_sql(n_merges: int) -> str:
    """The oracle SQL: K unrolled training rounds, then final-state
    segmentation joined back to every document."""
    ctes = [
        f"""pt AS (
          SELECT unnest(regexp_extract_all(text, {DUCK_PAT})) AS p FROM documents
        )""",
        """w0 AS MATERIALIZED (
          SELECT p, CAST(COUNT(*) AS BIGINT) AS n,
                 list_transform(range(length(p)),
                                i -> substr(p, CAST(i + 1 AS INTEGER), 1)) AS sym
          FROM pt GROUP BY p
        )""",
    ]
    for r in range(n_merges):
        w, nx = f"w{r}", f"w{r + 1}"
        ctes.append(f"""c{r} AS (
          SELECT sym[CAST(i + 1 AS INTEGER)] AS lhs,
                 sym[CAST(i + 2 AS INTEGER)] AS rhs, SUM(n) AS cnt
          FROM (SELECT sym, n, unnest(range(len(sym) - 1)) AS i
                FROM {w} WHERE len(sym) >= 2)
          GROUP BY 1, 2
        )""")
        ctes.append(f"""b{r} AS MATERIALIZED (
          SELECT lhs, rhs FROM c{r} ORDER BY cnt DESC, lhs, rhs LIMIT 1
        )""")
        ctes.append(f"""e{r} AS (
          SELECT p, n, unnest(sym) AS s, unnest(range(len(sym))) AS i FROM {w}
        )""")
        # greedy left-to-right: candidate positions, consecutive chains,
        # take even offsets within each chain
        ctes.append(f"""m{r} AS MATERIALIZED (
          SELECT p, i FROM (
            SELECT p, i,
                   (i - MIN(i) OVER (PARTITION BY p, grp)) % 2 = 0 AS take
            FROM (
              SELECT p, i,
                     i - ROW_NUMBER() OVER (PARTITION BY p ORDER BY i) AS grp
              FROM (
                SELECT sym, p, unnest(range(len(sym) - 1)) AS i FROM {w}
                WHERE len(sym) >= 2
              )
              WHERE sym[CAST(i + 1 AS INTEGER)] = (SELECT lhs FROM b{r})
                AND sym[CAST(i + 2 AS INTEGER)] = (SELECT rhs FROM b{r})
            )
          ) WHERE take
        )""")
        ctes.append(f"""{nx} AS MATERIALIZED (
          SELECT p, MIN(n) AS n, list(tok ORDER BY i) AS sym FROM (
            SELECT e.p, e.n, e.i,
                   CASE WHEN m1.i IS NOT NULL
                        THEN e.s || (SELECT rhs FROM b{r}) ELSE e.s END AS tok,
                   m2.i IS NOT NULL AS dropped
            FROM e{r} e
            LEFT JOIN m{r} m1 ON e.p = m1.p AND e.i = m1.i
            LEFT JOIN m{r} m2 ON e.p = m2.p AND e.i = m2.i + 1
          ) WHERE NOT dropped GROUP BY p
        )""")
    wk = f"w{n_merges}"
    ctes.append(f"""docpt AS (
      SELECT doc_id,
             unnest(regexp_extract_all(text, {DUCK_PAT})) AS p,
             unnest(range(len(regexp_extract_all(text, {DUCK_PAT})))) AS pti
      FROM documents
    )""")
    ctes.append(f"""tok AS (
      SELECT d.doc_id, d.pti, unnest(w.sym) AS t, unnest(range(len(w.sym))) AS ti
      FROM docpt d JOIN {wk} w ON d.p = w.p
    )""")
    ctes.append("""agg AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
             md5(string_agg(t, chr(31) ORDER BY pti, ti)) AS tokens_md5
      FROM tok GROUP BY doc_id
    )""")
    body = ",\n        ".join(ctes)
    return f"""
        WITH {body}
        SELECT d.doc_id,
               COALESCE(a.n_tokens, 0) AS n_tokens,
               COALESCE(a.tokens_md5, md5('')) AS tokens_md5
        FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
    """


def main() -> int:
    import duckdb

    corpus = [
        (1, "the cat sat on the mat, the cat sat."),
        (2, "low lower lowest, new newer newest!"),
        (3, "aaaa bbbb aaaa bbbb ab ab ab"),
        (4, "it's the user's choice -- don't shout"),
        (5, ""),
        (6, "naïve café résumé über"),
        (7, "the the the the the"),
        (8, "  spaced   out   text  "),
    ]
    for k in (0, 1, 3, 10):
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE documents AS SELECT * FROM (VALUES "
            + ",".join("({}, '{}')".format(i, t.replace("'", "''")) for i, t in corpus)
            + ") t(doc_id, text)"
        )
        got = {
            r[0]: (r[1], r[2])
            for r in con.execute(duck_bpe_sql(k)).fetchall()
        }
        merges = py_train([t for _, t in corpus], k)
        want = py_segment([t for _, t in corpus], [i for i, _ in corpus], merges)
        if got != want:
            print(f"K={k} MISMATCH\nmerges={merges}")
            for d in sorted(want):
                if got.get(d) != want[d]:
                    print(f"  doc {d}: got={got.get(d)} want={want[d]}")
            return 1
        print(f"K={k} OK ({len(merges)} merges: {merges})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
