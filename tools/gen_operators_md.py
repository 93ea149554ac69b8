#!/usr/bin/env python3
"""Regenerate OPERATORS.md from a Verify output dir and a Bench JSON line.

Usage: python3 tools/gen_operators_md.py <verifyOutDir> <benchJsonFile>

<benchJsonFile> holds the single JSON line Bench prints (optionally with
log prefixes; the line containing "metric" is used).
"""
import json
import sys
from pathlib import Path

CATS = {
    'scan': 'A. Scans', 'filter': 'B. Filters/projection', 'project': 'B. Filters/projection',
    'sort': 'F. Sorts/limits', 'limit': 'F. Sorts/limits', 'topk': 'F. Sorts/limits',
    'join': 'C. Joins', 'agg': 'D. Aggregations', 'win': 'E. Windows', 'set': 'G. Set ops',
    'fn': 'H. Scalar functions', 'gen': 'I. Generators', 'stream': 'J. Streaming (batch-checked)',
    'llm': 'K/M. LLM & scale-path ops', 'udf': 'L. UDF/UDAF', 'udaf': 'L. UDF/UDAF',
    'sub': 'N. Subqueries'}
ORDER = ['A. Scans', 'B. Filters/projection', 'C. Joins', 'D. Aggregations', 'E. Windows',
         'F. Sorts/limits', 'G. Set ops', 'H. Scalar functions', 'I. Generators',
         'J. Streaming (batch-checked)', 'K/M. LLM & scale-path ops', 'L. UDF/UDAF',
         'N. Subqueries', 'other']


def main():
    out_dir, bench_file = sys.argv[1], sys.argv[2]
    oracle = json.loads((Path(out_dir) / 'oracle_sql.json').read_text())
    bench_line = next(l for l in Path(bench_file).read_text().splitlines() if '"metric"' in l)
    bench = json.loads(bench_line[bench_line.index('{'):])['queries']
    rows = {}
    for n in sorted(set(oracle) | set(bench)):
        rows.setdefault(CATS.get(n.split('_')[0], 'other'), []).append(n)
    names = sorted(set(oracle) | set(bench))
    out = ["# OPERATORS — declared query inventory (generated)", "",
           f"{len(names)} declared queries; {len(oracle)} with a DuckDB oracle",
           "(`agg_approx_distinct` and `agg_approx_quantiles` are rows-only by",
           "design: HLL/GK sketch estimates are engine-specific; unit tests bound",
           "their error vs exact). Timings: `Bench` at sf0.1, local[32], steady",
           "state, median of 3 runs; -1.00 marks a failed query.",
           "",
           "Regenerate: `python3 tools/gen_operators_md.py <verifyOut> <benchJson>`", "",
           "## Production-path pairings (brute-force oracle vs scale path)",
           "",
           "- `llm_knn_join` is the EXACT brute-force 1-NN and is declared as the",
           "  correctness oracle for its bucketed siblings; at scale, run",
           "  `llm_ann_ivf` (IVF cell probe) or `llm_ann_lsh` (hyperplane-bucket",
           "  probe) instead — same scoring kernel (`FloatVecDot`), same",
           "  tie-break semantics, sub-quadratic candidates. See SCALING.md.",
           "- `llm_dedup_near` is the exact-Jaccard oracle; `llm_dedup_minhash_lsh`",
           "  (probabilistic) and `llm_dedup_simhash` (lossless Hamming banding)",
           "  are its sketch-based scale paths.",
           "- `llm_dedup_embcos` is itself scale-path: exact IVF-bucketed with",
           "  lossless triangle-inequality cell-pair pruning (SCALING.md).", ""]
    for cat in ORDER:
        if cat not in rows:
            continue
        out += [f"## {cat}", "", "| query | oracle | sf0.1 sec |", "| --- | --- | --- |"]
        for n in rows[cat]:
            o = "DuckDB" if n in oracle else "rows-only"
            out.append(f"| `{n}` | {o} | {bench.get(n, float('nan')):.2f} |")
        out.append("")
    Path('OPERATORS.md').write_text("\n".join(out))
    print(f"wrote OPERATORS.md: {len(names)} queries")


if __name__ == "__main__":
    main()
