"""Empirical scaling probe: sf0.1 vs a generated sf1 (VERDICT r9 #7).

SCALE.md's 100 TB arguments were design-only; this script measures
them. It materializes a 10x copy of the five fact-scale tables
(orders, lineitem, events, documents, embeddings) under
``.scale_probe/sf1/`` (git-ignored; dims copied verbatim), times the
top-N most expensive headline queries at both SFs, and prints a
per-query scaling exponent

    exponent = log10(t_sf1 / t_sf0.1)

(10x data: exponent 1.0 = linear, 2.0 = quadratic). Replication is
key-remapped so relational fidelity holds:

- ``o_orderkey``/``l_orderkey`` -> key*10 + replica (orders keep their
  baskets; basket WIDTH stays constant, so pair-per-order fan-outs
  must scale linearly);
- ``event_id``/``user_id``/``doc_id``/``vec_id`` -> key*10 + replica
  (per-user streams and per-doc sizes stay constant);
- dates/text/vectors are kept VERBATIM per replica: the day grid stays
  fixed (calendar-bounded pair counts must NOT grow), and each
  document/vector gains 9 exact duplicates — a 100%-duplicate corpus
  stress: banded/blocked dedup tiers must stay linear (bucket sizes
  grow by the replica factor only), and cluster-size-targeting
  (SemDeDup's N/TARGET derivation) must keep within-cluster pair
  volume ~N.

Timing protocol = bench.py's: warm every probed query once at
sf0.001, then interleaved passes with clearCache + py/JVM GC between
timings; per-query exponent uses the MEDIAN of ``--runs`` samples.

Usage:
  PYTHONPATH=. python scripts/scale_probe.py --generate   # build sf1
  PYTHONPATH=. python scripts/scale_probe.py --measure    # time + report
"""

from __future__ import annotations

import argparse
import gc
import json
import math
import os
import shutil
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(REPO, ".scale_probe", "sf1")
REPLICAS = 10

#: the top of the r11 bench cost ranking (bench_spread.json medians,
#: refreshed per VERDICT r10 #9; previous list was the r9/r10 ranking)
PROBE_QUERIES = [
    "ssl_cotrain_two_round_nb",
    "mann_kendall_daily_trend",
    "dedup_semantic_semdedup",
    "part_degree_assortativity",
    "ssl_selftrain_two_round_nb",
    "similarity_hard_negatives_ann",
    "ssl_selftrain_threshold",
    "ssl_tritrain_one_round_nb",
    "dedup_cluster_components",
    "basket_part_lift",
]

_SCALED_SQL = {
    "orders": f"""
        SELECT o_orderkey * {REPLICAS} + r.r AS o_orderkey,
               o_custkey, o_orderstatus, o_totalprice, o_orderdate,
               o_orderpriority
        FROM read_parquet('{SF01}/orders.parquet')
        CROSS JOIN range({REPLICAS}) r(r)""",
    "lineitem": f"""
        SELECT l_orderkey * {REPLICAS} + r.r AS l_orderkey,
               l_partkey, l_suppkey, l_linenumber, l_quantity,
               l_extendedprice, l_discount, l_tax, l_returnflag,
               l_linestatus, l_shipdate
        FROM read_parquet('{SF01}/lineitem.parquet')
        CROSS JOIN range({REPLICAS}) r(r)""",
    "events": f"""
        SELECT event_id * {REPLICAS} + r.r AS event_id, ts,
               user_id * {REPLICAS} + r.r AS user_id,
               event_type, value, props
        FROM read_parquet('{SF01}/events.parquet')
        CROSS JOIN range({REPLICAS}) r(r)""",
    "documents": f"""
        SELECT doc_id * {REPLICAS} + r.r AS doc_id, text, lang, source,
               n_chars
        FROM read_parquet('{SF01}/documents.parquet')
        CROSS JOIN range({REPLICAS}) r(r)""",
    "embeddings": f"""
        SELECT vec_id * {REPLICAS} + r.r AS vec_id, embedding, label
        FROM read_parquet('{SF01}/embeddings.parquet')
        CROSS JOIN range({REPLICAS}) r(r)""",
}

_COPIED = ["region", "nation", "customer", "supplier", "part"]

# Second leg (r11, VERDICT r10 #3): sf1 -> sf2 (2x sf1 = 20x sf0.1),
# embeddings only — the leg exists to measure dedup_semantic_semdedup
# ABOVE the cluster-floor regime transition the first leg straddled
# (sf0.1: N=2k -> k floors at 16; sf1: N=20k -> k=20; sf2: N=40k ->
# k=40 — both legs of sf1->sf2 sit above the floor, so the measured
# exponent tests the design claim Σ|c|² ≈ N·TARGET_CLUSTER_SIZE
# directly). Exponent base is log2 (2x data).
SF2 = os.path.join(REPO, ".scale_probe", "sf2")
SF2_REPLICAS = 2
SECOND_LEG_QUERIES = ["dedup_semantic_semdedup"]

# Near-dup replica leg (r12, VERDICT r11 #8): the sf1 corpus is 100%
# EXACT duplicates, so the cascade's cheap exact tier absorbed the
# entire 10x growth (measured exponent 0.00) and the winnowing +
# Jaccard-verify tiers never saw 10x survivors. This leg perturbs each
# replica's text with a replica-unique trailing token: every copy gets
# a distinct md5, the exact tier passes EVERYTHING through, and the
# expensive tiers face the full 10x document load with ~C(10,2)
# near-dup candidate pairs per original document. Documents only (the
# probed dedup queries read no other table).
SF1_NEARDUP = os.path.join(REPO, ".scale_probe", "sf1_neardup")
NEARDUP_QUERIES = ["dedup_cascade_report", "dedup_winnowing_pairs"]

# Text-VOLUME leg (r13, VERDICT r12 #6): the replica legs grow text
# volume only via ROW COUNT (each document's text is verbatim). The
# two ~0.6-exponent text entries are tokenize-bound, so the claim to
# test is linearity in tokens-per-document too: this leg DOUBLES every
# document's text in place (text || ' ' || text — same row count, 2x
# token volume, term SET per doc unchanged, counts doubled) and
# measures log2 exponents. Linear-in-text-volume => exponent ~1.
SF01_TEXT2 = os.path.join(REPO, ".scale_probe", "sf01_text2")
TEXT_LEG_QUERIES = ["text_tfidf_portable_norms", "text_readability_scores"]

# Near-dup second leg (r13, VERDICT r12 #6): 2x replica of the
# perturbed near-dup corpus (each copy gets another distinct suffix so
# exact hashes stay unique) — measures the cascade's winnow/verify
# tiers from 10x to 20x survivors, log2 exponents.
SF2_NEARDUP = os.path.join(REPO, ".scale_probe", "sf2_neardup")

# Third octaves (r14, VERDICT r13 #6): confirm the r13 exponents
# aren't flattered by small absolute times — (a) 40x near-dup replica
# (one more doubling of the 100%-near-dup corpus), (b) the text-VOLUME
# axis re-run at SF1's row count (10x rows, then text doubled in
# place) for the 0.69-exponent readability entry.
SF3_NEARDUP = os.path.join(REPO, ".scale_probe", "sf3_neardup")
SF1_TEXT2 = os.path.join(REPO, ".scale_probe", "sf1_text2")


def generate() -> None:
    import duckdb

    os.makedirs(SF1, exist_ok=True)
    con = duckdb.connect()
    for t, sql in _SCALED_SQL.items():
        out = os.path.join(SF1, f"{t}.parquet")
        con.execute(f"COPY ({sql}) TO '{out}' (FORMAT PARQUET)")
        n = con.execute(f"SELECT COUNT(*) FROM read_parquet('{out}')").fetchone()[0]
        print(f"{t}: {n} rows -> {out}", flush=True)
    for t in _COPIED:
        shutil.copyfile(
            os.path.join(SF01, f"{t}.parquet"), os.path.join(SF1, f"{t}.parquet")
        )
        print(f"{t}: copied verbatim", flush=True)


def generate_sf2() -> None:
    """2x replica of sf1's EMBEDDINGS (key-remapped; vectors verbatim,
    so every vector now has 19 exact duplicates — the adversarial
    100%-dup stress at double the corpus). Embeddings only: the
    second-leg query reads no other table, and the other fact tables
    at 20x would cost disk for nothing."""
    import duckdb

    if not os.path.isdir(SF1):
        raise SystemExit("run --generate first")
    os.makedirs(SF2, exist_ok=True)
    con = duckdb.connect()
    out = os.path.join(SF2, "embeddings.parquet")
    con.execute(
        f"""COPY (
        SELECT vec_id * {SF2_REPLICAS} + r.r AS vec_id, embedding, label
        FROM read_parquet('{SF1}/embeddings.parquet')
        CROSS JOIN range({SF2_REPLICAS}) r(r)
    ) TO '{out}' (FORMAT PARQUET)"""
    )
    n = con.execute(f"SELECT COUNT(*) FROM read_parquet('{out}')").fetchone()[0]
    print(f"embeddings: {n} rows -> {out}", flush=True)


def generate_neardup() -> None:
    """10x documents replica where each copy's text is suffixed with a
    replica-unique token (' zrepN') — exact-hash unique, n-gram/
    fingerprint near-identical. The suffix perturbs only the last few
    k-grams, so winnowing buckets the 10 copies of a document
    together and the verify tier scores all ~45 intra-group pairs."""
    import duckdb

    os.makedirs(SF1_NEARDUP, exist_ok=True)
    con = duckdb.connect()
    out = os.path.join(SF1_NEARDUP, "documents.parquet")
    con.execute(
        f"""COPY (
        SELECT doc_id * {REPLICAS} + r.r AS doc_id,
               text || ' zrep' || CAST(r.r AS VARCHAR) AS text,
               lang, source, n_chars + 6 AS n_chars
        FROM read_parquet('{SF01}/documents.parquet')
        CROSS JOIN range({REPLICAS}) r(r)
    ) TO '{out}' (FORMAT PARQUET)"""
    )
    n = con.execute(f"SELECT COUNT(*) FROM read_parquet('{out}')").fetchone()[0]
    print(f"documents (near-dup perturbed): {n} rows -> {out}", flush=True)


def generate_text2() -> None:
    """Same documents, text doubled in place (2x token volume at
    constant row count) — the text-VOLUME scaling axis."""
    import duckdb

    os.makedirs(SF01_TEXT2, exist_ok=True)
    con = duckdb.connect()
    out = os.path.join(SF01_TEXT2, "documents.parquet")
    con.execute(
        f"""COPY (
        SELECT doc_id, text || ' ' || text AS text, lang, source,
               2 * n_chars + 1 AS n_chars
        FROM read_parquet('{SF01}/documents.parquet')
    ) TO '{out}' (FORMAT PARQUET)"""
    )
    n = con.execute(f"SELECT COUNT(*) FROM read_parquet('{out}')").fetchone()[0]
    print(f"documents (text doubled): {n} rows -> {out}", flush=True)


def generate_neardup2() -> None:
    """2x replica of the perturbed near-dup corpus; each copy gains a
    second replica-unique suffix so every md5 stays distinct and the
    cascade's exact tier still passes everything through."""
    import duckdb

    if not os.path.isdir(SF1_NEARDUP):
        raise SystemExit("run --generate-neardup first")
    os.makedirs(SF2_NEARDUP, exist_ok=True)
    con = duckdb.connect()
    out = os.path.join(SF2_NEARDUP, "documents.parquet")
    con.execute(
        f"""COPY (
        SELECT doc_id * 2 + r.r AS doc_id,
               text || ' zz' || CAST(r.r AS VARCHAR) AS text,
               lang, source, n_chars + 4 AS n_chars
        FROM read_parquet('{SF1_NEARDUP}/documents.parquet')
        CROSS JOIN range(2) r(r)
    ) TO '{out}' (FORMAT PARQUET)"""
    )
    n = con.execute(f"SELECT COUNT(*) FROM read_parquet('{out}')").fetchone()[0]
    print(f"documents (near-dup 2x): {n} rows -> {out}", flush=True)


def generate_neardup3() -> None:
    """One more doubling of the near-dup corpus (40x survivors); the
    third distinct suffix keeps every md5 unique."""
    import duckdb

    if not os.path.isdir(SF2_NEARDUP):
        raise SystemExit("run --generate-neardup2 first")
    os.makedirs(SF3_NEARDUP, exist_ok=True)
    con = duckdb.connect()
    out = os.path.join(SF3_NEARDUP, "documents.parquet")
    con.execute(
        f"""COPY (
        SELECT doc_id * 2 + r.r AS doc_id,
               text || ' zy' || CAST(r.r AS VARCHAR) AS text,
               lang, source, n_chars + 4 AS n_chars
        FROM read_parquet('{SF2_NEARDUP}/documents.parquet')
        CROSS JOIN range(2) r(r)
    ) TO '{out}' (FORMAT PARQUET)"""
    )
    n = con.execute(f"SELECT COUNT(*) FROM read_parquet('{out}')").fetchone()[0]
    print(f"documents (near-dup 4x = 40x survivors): {n} rows -> {out}", flush=True)


def generate_text2_sf1() -> None:
    """SF1's documents (10x rows) with text doubled in place — the
    text-VOLUME axis at 10x the r13 leg's absolute times."""
    import duckdb

    if not os.path.isdir(SF1):
        raise SystemExit("run --generate first")
    os.makedirs(SF1_TEXT2, exist_ok=True)
    con = duckdb.connect()
    out = os.path.join(SF1_TEXT2, "documents.parquet")
    con.execute(
        f"""COPY (
        SELECT doc_id, text || ' ' || text AS text, lang, source,
               2 * n_chars + 1 AS n_chars
        FROM read_parquet('{SF1}/documents.parquet')
    ) TO '{out}' (FORMAT PARQUET)"""
    )
    n = con.execute(f"SELECT COUNT(*) FROM read_parquet('{out}')").fetchone()[0]
    print(f"documents (sf1 text doubled): {n} rows -> {out}", flush=True)


def measure(
    runs: int,
    queries: list[str],
    legs: tuple[tuple[str, str], tuple[str, str]] = (("sf0.1", SF01), ("sf1", SF1)),
    exponent_base: float = 10.0,
) -> dict:
    from tfm_semisup_spark.queries import QUERIES, load_all_queries
    from tfm_semisup_spark.session import get_spark

    load_all_queries()
    spark = get_spark(app_name="scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    def isolate():
        spark.catalog.clearCache()
        gc.collect()
        spark._jvm.System.gc()

    for name in queries:  # warm families once at the tiny SF
        QUERIES[name](spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()
    isolate()
    (tag_a, dir_a), (tag_b, dir_b) = legs
    samples: dict[str, dict[str, list[float]]] = {
        n: {tag_a: [], tag_b: []} for n in queries
    }
    for _ in range(runs):
        for name in queries:
            for tag, sf_dir in legs:
                t0 = time.perf_counter()
                QUERIES[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                samples[name][tag].append(time.perf_counter() - t0)
                isolate()
    report = {}
    for name in queries:
        ta = statistics.median(samples[name][tag_a])
        tb = statistics.median(samples[name][tag_b])
        report[name] = {
            f"{tag_a}_sec": round(ta, 2),
            f"{tag_b}_sec": round(tb, 2),
            "ratio": round(tb / ta, 2),
            "exponent": round(math.log(tb / ta) / math.log(exponent_base), 2),
        }
    return report


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--generate", action="store_true")
    ap.add_argument("--generate-sf2", action="store_true")
    ap.add_argument("--generate-neardup", action="store_true")
    ap.add_argument("--generate-text2", action="store_true")
    ap.add_argument("--generate-neardup2", action="store_true")
    ap.add_argument("--generate-neardup3", action="store_true")
    ap.add_argument("--generate-text2-sf1", action="store_true")
    ap.add_argument("--measure", action="store_true")
    ap.add_argument(
        "--second-leg",
        action="store_true",
        help="measure sf1 -> sf2 (log2 exponents) instead of sf0.1 -> sf1",
    )
    ap.add_argument(
        "--near-dup",
        action="store_true",
        help="measure sf0.1 -> the perturbed 10x documents replica "
        "(exact tier passes everything; stresses winnow/verify tiers)",
    )
    ap.add_argument(
        "--near-dup2",
        action="store_true",
        help="measure sf1_neardup -> 2x (log2 exponents)",
    )
    ap.add_argument(
        "--text-leg",
        action="store_true",
        help="measure sf0.1 -> text-doubled documents (log2 exponents; "
        "text VOLUME axis at constant row count)",
    )
    ap.add_argument(
        "--near-dup3",
        action="store_true",
        help="measure 20x -> 40x near-dup survivors (log2 exponents; "
        "third octave, VERDICT r13 #6)",
    )
    ap.add_argument(
        "--text-leg-sf1",
        action="store_true",
        help="measure sf1 -> sf1-text-doubled (log2 exponents; the "
        "text-VOLUME axis at 10x absolute times, VERDICT r13 #6)",
    )
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--queries", nargs="*", default=None)
    args = ap.parse_args()
    if args.generate:
        generate()
    if args.generate_sf2:
        generate_sf2()
    if args.generate_neardup:
        generate_neardup()
    if args.generate_text2:
        generate_text2()
    if args.generate_neardup2:
        generate_neardup2()
    if args.generate_neardup3:
        generate_neardup3()
    if args.generate_text2_sf1:
        generate_text2_sf1()
    if (
        args.measure
        or args.second_leg
        or args.near_dup
        or args.near_dup2
        or args.near_dup3
        or args.text_leg
        or args.text_leg_sf1
    ):
        if args.near_dup3:
            if not os.path.isdir(SF3_NEARDUP):
                print("run --generate-neardup3 first", file=sys.stderr)
                return 1
            report = measure(
                args.runs,
                args.queries or NEARDUP_QUERIES,
                legs=(("sf2_neardup", SF2_NEARDUP), ("sf3_neardup", SF3_NEARDUP)),
                exponent_base=2.0,
            )
        elif args.text_leg_sf1:
            if not os.path.isdir(SF1_TEXT2):
                print("run --generate-text2-sf1 first", file=sys.stderr)
                return 1
            report = measure(
                args.runs,
                args.queries or ["text_readability_scores"],
                legs=(("sf1", SF1), ("sf1_text2", SF1_TEXT2)),
                exponent_base=2.0,
            )
        elif args.text_leg:
            if not os.path.isdir(SF01_TEXT2):
                print("run --generate-text2 first", file=sys.stderr)
                return 1
            report = measure(
                args.runs,
                args.queries or TEXT_LEG_QUERIES,
                legs=(("sf0.1", SF01), ("sf01_text2", SF01_TEXT2)),
                exponent_base=2.0,
            )
        elif args.near_dup2:
            if not os.path.isdir(SF2_NEARDUP):
                print("run --generate-neardup2 first", file=sys.stderr)
                return 1
            report = measure(
                args.runs,
                args.queries or NEARDUP_QUERIES,
                legs=(("sf1_neardup", SF1_NEARDUP), ("sf2_neardup", SF2_NEARDUP)),
                exponent_base=2.0,
            )
        elif args.near_dup:
            if not os.path.isdir(SF1_NEARDUP):
                print("run --generate-neardup first", file=sys.stderr)
                return 1
            report = measure(
                args.runs,
                args.queries or NEARDUP_QUERIES,
                legs=(("sf0.1", SF01), ("sf1_neardup", SF1_NEARDUP)),
            )
        elif args.second_leg:
            if not os.path.isdir(SF2):
                print("run --generate-sf2 first", file=sys.stderr)
                return 1
            report = measure(
                args.runs,
                args.queries or SECOND_LEG_QUERIES,
                legs=(("sf1", SF1), ("sf2", SF2)),
                exponent_base=2.0,
            )
        else:
            if not os.path.isdir(SF1):
                print("run --generate first", file=sys.stderr)
                return 1
            report = measure(args.runs, args.queries or PROBE_QUERIES)
        print(json.dumps(report, indent=1))
        worst = max(report.values(), key=lambda r: r["exponent"])
        print(
            f"# worst exponent: {worst['exponent']} "
            f"(bar: 1.3 — VERDICT r9 #7)"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
