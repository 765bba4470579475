"""Deterministic sf1 generator (VERDICT-r7 item 2): 10x re-keyed
growth of the sf0.1 heavy-tier tables, so the dedup/ANN/CC/packing/
graph tiers can be oracle-checked and benched at 100x the driver's
sf0.01 gate scale.

The corpus tables those tiers read — ``documents``, ``embeddings``,
``events`` — are scaled as below.  Since r10 (VERDICT r9 item 6) the
TPC-H FACT web also grows 10x with a FK-consistent re-key (copy k of
an order references copy k of its customer; copy k of a lineitem
references copy k of its order/part/supplier — every key gets the
same ``+ k*OFF``, so the join graph is ten disjoint sf0.1-shaped
components), giving the join-heavy TPC-H tier the same 10x
accountability as the corpus tier.  ``nation``/``region`` stay fixed
— TPC-H itself holds them constant as SF grows, and per-nation group
sizes growing 10x IS the realistic growth shape.  Copy k of a row gets key
``id + k*10_000_000``; the offset is a multiple of every modulus the
catalog derives semantics from (doc batches ``% 10``, ANN queries
``% 50``, heavy-hitter keys ``% 2 / % 16 / % 100000``), so per-copy
residue classes are preserved exactly.

Growth must not be DEGENERATE duplication — 10 identical copies would
make every doc a 9-way exact twin and every vector tied at cosine 1.0,
inflating the near-dup graph quadratically instead of linearly.  Each
copy is therefore transformed by a structure-preserving bijection:

- documents: every whitespace token gets a per-copy all-lowercase
  suffix (copy 0 unchanged) — within-copy shingle/Jaccard structure is
  IDENTICAL to sf0.1 (token bijection), across copies the shingle
  spaces are disjoint, so near-dup pairs scale exactly 10x;
- embeddings: per-copy cyclic rotation of the 64 dimensions (shift
  7k mod 64) — rotation preserves every within-copy inner product and
  norm bit-for-bit, while cross-copy similarities fall to background
  levels (realistic corpus growth, not a 10-way tie);
- events: pure key offsets (event_id, user_id) — 10x users with the
  same per-user temporal structure; session/graph/timeseries work
  scales linearly by construction.

Usage: python tools/make_sf1.py [out_dir]   (default .scratch/sf1)
Idempotent via a .complete.v2 marker (bumped when the TPC-H growth
mode landed; a v1 dir is wiped and rebuilt); ~30 s, ~250 MB.
"""

from __future__ import annotations

import os
import shutil
import sys
from pathlib import Path

import duckdb

COPIES = 10
OFF = 10_000_000
SRC = "/root/testdata/sf0.1"
DIM = 64

PASSTHROUGH = ("region", "nation")

#: TPC-H fact web: table -> key columns that get the per-copy offset
#: (primary keys and the foreign keys pointing INSIDE the scaled web;
#: n_nationkey/s_nationkey/c_nationkey point at the fixed dims and
#: stay).
TPCH_GROW = {
    "customer": ("c_custkey",),
    "supplier": ("s_suppkey",),
    "part": ("p_partkey",),
    "orders": ("o_orderkey", "o_custkey"),
    "lineitem": ("l_orderkey", "l_partkey", "l_suppkey"),
}


#: Every artifact this tool has ever written into out_dir — the rmtree
#: guard below only wipes a directory whose contents are a subset of
#: these (a recognizable stale build), never an arbitrary user path.
_OWN_ARTIFACTS = frozenset(
    f"{t}.parquet"
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings partsupp".split()
    )
) | {".complete.v1", ".complete.v2", ".complete.v3"}


def build(out_dir: str, copies: int = COPIES) -> str:
    """Build a ``copies``-x re-keyed growth of sf0.1 into ``out_dir``.

    ``copies=10`` is the standing sf1 shape (byte-identical to every
    prior round: the k<26 token suffix and k<64 rotation branches
    below are exactly the original formulas).  ``copies=100`` is the
    r15 sf10 probe (VERDICT r14 item 4) — the two bijection families
    extend without degenerating:

    - token suffix: one letter for k<26 (``qa..qz``), two letters
      beyond (``qba..qdv``) — suffixes stay distinct per copy and all
      lowercase, so the ``[a-z]{3,}`` token-shape predicates hold and
      shingle spaces stay disjoint across all 100 copies;
    - embedding transform: cyclic rotation by ``7k mod 64`` composed,
      for k >= 64 (where the 64 distinct rotations would repeat and
      create exact cross-copy duplicate vectors), with a global
      negation — both are orthogonal maps applied uniformly within a
      copy, so every within-copy inner product is preserved while
      cross-copy similarity stays at background levels.
    """
    if copies > 100:
        raise ValueError("copies > 100: extend the suffix alphabet first")
    out = Path(out_dir)
    marker = out / ".complete.v2"
    if marker.exists():
        return str(out)
    if out.exists():
        # stale build (older marker / interrupted run) — rebuild.  Only
        # rmtree what is RECOGNIZABLY ours: out_dir comes from argv, so
        # a typo'd path must abort, not be deleted (ADVICE r10).
        entries = {p.name for p in out.iterdir()}
        if not entries <= _OWN_ARTIFACTS:
            raise SystemExit(
                f"refusing to wipe {out}: unexpected entries "
                f"{sorted(entries - _OWN_ARTIFACTS)[:5]} — not a stale "
                "sf1 build; remove it manually if intended"
            )
        shutil.rmtree(out)
    out.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET threads=8")
    copies_rel = f"(SELECT unnest(range({copies})) AS k)"
    # per-copy token suffix: one lowercase letter for k < 26 (the
    # byte-exact sf1 formula), two beyond — distinct per copy, always
    # [a-z]+ so token-shape predicates are preserved
    suffix = (
        "CASE WHEN c.k < 26 THEN 'q' || chr(97 + c.k::INT) "
        "ELSE 'q' || chr(97 + (c.k // 26)::INT) "
        "|| chr(97 + (c.k % 26)::INT) END"
    )

    # documents: per-copy token suffix 'q'+letter (keeps [a-z]{3,}
    # token-shape predicates true); n_chars recomputed for the new text
    con.execute(
        f"""
COPY (
  SELECT d.doc_id + c.k*{OFF} AS doc_id,
         CASE WHEN c.k = 0 THEN d.text
              ELSE array_to_string(
                     list_transform(string_split(d.text, ' '),
                                    t -> t || {suffix}),
                     ' ')
         END AS text,
         d.lang, d.source,
         CASE WHEN c.k = 0 THEN d.n_chars
              ELSE len(array_to_string(
                     list_transform(string_split(d.text, ' '),
                                    t -> t || {suffix}),
                     ' '))::BIGINT
         END AS n_chars
  FROM read_parquet('{SRC}/documents.parquet') d, {copies_rel} c
  ORDER BY doc_id
) TO '{out}/documents.parquet' (FORMAT PARQUET)
"""
    )

    # embeddings: cyclic dim rotation by 7k mod 64 per copy
    con.execute(
        f"""
COPY (
  SELECT e.vec_id + c.k*{OFF} AS vec_id,
         CASE WHEN c.k = 0 THEN e.embedding
              WHEN c.k < 64 THEN CAST(list_concat(
                     e.embedding[((7*c.k) % {DIM}) + 1 : {DIM}],
                     e.embedding[1 : (7*c.k) % {DIM}]
                   ) AS FLOAT[])
              ELSE CAST(list_transform(list_concat(
                     e.embedding[((7*c.k) % {DIM}) + 1 : {DIM}],
                     e.embedding[1 : (7*c.k) % {DIM}]
                   ), x -> -x) AS FLOAT[])
         END AS embedding,
         e.label
  FROM read_parquet('{SRC}/embeddings.parquet') e, {copies_rel} c
  ORDER BY vec_id
) TO '{out}/embeddings.parquet' (FORMAT PARQUET)
"""
    )

    # events: key offsets only
    con.execute(
        f"""
COPY (
  SELECT e.event_id + c.k*{OFF} AS event_id, e.ts,
         e.user_id + c.k*{OFF} AS user_id,
         e.event_type, e.value, e.props
  FROM read_parquet('{SRC}/events.parquet') e, {copies_rel} c
  ORDER BY event_id
) TO '{out}/events.parquet' (FORMAT PARQUET)
"""
    )

    for t in PASSTHROUGH:
        shutil.copyfile(f"{SRC}/{t}.parquet", out / f"{t}.parquet")

    # TPC-H fact web: FK-consistent 10x re-key (values pass through —
    # ten disjoint sf0.1-shaped join components; revenue/count aggs
    # scale exactly 10x, per-group correlation structure is preserved
    # per copy)
    for t, keycols in TPCH_GROW.items():
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{t}.parquet')"
            ).fetchall()
        ]
        proj = ", ".join(
            f"t.{c} + c.k*{OFF} AS {c}" if c in keycols else f"t.{c}"
            for c in cols
        )
        con.execute(
            f"""
COPY (
  SELECT {proj}
  FROM read_parquet('{SRC}/{t}.parquet') t, {copies_rel} c
  ORDER BY {keycols[0]}
) TO '{out}/{t}.parquet' (FORMAT PARQUET)
"""
        )

    # sanity: rotation really preserved within-copy geometry
    n0, n1 = con.execute(
        f"""
SELECT (SELECT count(*) FROM read_parquet('{SRC}/documents.parquet')),
       (SELECT count(*) FROM read_parquet('{out}/documents.parquet'))
"""
    ).fetchone()
    assert n1 == copies * n0, (n0, n1)
    marker.touch()
    return str(out)


if __name__ == "__main__":
    dest = sys.argv[1] if len(sys.argv) > 1 else str(
        Path(__file__).resolve().parent.parent / ".scratch" / "sf1"
    )
    print(build(dest))
