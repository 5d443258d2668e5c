#!/usr/bin/env python3
"""Per-query bench regression gate: diff the fresh BENCH_LOCAL.json
against a reference per-query map (default: the archived previous run)
and emit BENCH_DELTA.json with a `regressions` list.

A query regresses when BOTH hold (kills sub-second noise chatter):
  new >= 1.5x ref   AND   new - ref >= 0.3 s

Usage: scripts/bench_delta.py [new.json] [ref.json] [--allow-subset]
Exit 1 when the regressions list is non-empty (run_bench.sh propagates
it), so a regression can never ship silently — the list is the artifact
the round writeup has to either empty or explain.

`--allow-subset` skips the truncation refusal for DELIBERATE
subset-vs-subset diffs (e.g. two BENCH_SUBSET.json files from
SPARK_GRAFT_BENCH_ONLY runs); the cross-scale refusal still applies.
"""
import json
import sys


def per_query(path):
    with open(path) as f:
        d = json.load(f)
    # Accept both the Bench output shape {"queries": {...}} and the
    # driver archive shape {"parsed": {"queries": {...}}}.
    if isinstance(d.get("queries"), dict):
        return d["queries"], d.get("value"), d.get("n_queries"), d.get("sf")
    p = d.get("parsed") or {}
    return p.get("queries", {}), p.get("value"), p.get("n_queries"), \
        p.get("sf")


def main():
    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    new_path = pos[0] if len(pos) > 0 else "BENCH_LOCAL.json"
    ref_path = pos[1] if len(pos) > 1 else "BENCH_PREV.json"
    new_q, new_total, new_n, new_sf = per_query(new_path)
    try:
        ref_q, ref_total, ref_n, ref_sf = per_query(ref_path)
    except FileNotFoundError:
        ref_q, ref_total, ref_n, ref_sf = {}, None, None, None

    # A run at a different scale factor is not a regression reference —
    # every ratio would be the data-size delta, not a plan change (found
    # the hard way: an sf0.001 smoke gated against the sf0.1 archive
    # reported 30 bogus "regressions").
    if ref_q and new_sf and ref_sf and new_sf != ref_sf:
        msg = (f"ref {ref_path} is sf '{ref_sf}' but new {new_path} is "
               f"sf '{new_sf}' — cross-scale timings aren't comparable; "
               f"benchmark both sides at the same sf dir")
        print(f"[bench-delta] {msg}", file=sys.stderr)
        with open("BENCH_DELTA.json", "w") as f:
            json.dump({"ref": ref_path, "new": new_path, "error": msg},
                      f, indent=1)
        return 2

    # From r12 on, the STDOUT total line (what the driver archives as
    # "parsed") carries only the 10 slowest queries under the same
    # "queries" key — the full map lives only in the written file. A
    # truncated archive on EITHER side would silently gate on <5% of
    # the suite and exit 0; refuse it instead of "passing", and leave
    # an error artifact so the refused run can't be mistaken for the
    # previous run's clean BENCH_DELTA.json.
    #
    # Detection is three-layer: the self-declared n_queries count (Bench
    # writes it in BOTH output shapes from r12 on) catches truncation
    # deterministically; the cross-side length ratio covers a
    # pre-n_queries archive diffed against a full map; and the
    # exactly-10-undeclared check covers the residual gap — two PRE-r12
    # archives BOTH truncated to the same 10 slowest (min == max, so the
    # ratio test is blind, and neither side declares n_queries). Ten
    # entries with no declaration is the r12 stdout shape's fingerprint,
    # never a legitimate full map of this 200+-query suite.
    def truncated(q, n):
        return bool(q) and n is not None and len(q) < n
    both_sides_short = ref_q and \
        min(len(ref_q), len(new_q)) < max(len(ref_q), len(new_q)) // 2
    both_undeclared_10 = ref_q and new_n is None and ref_n is None and \
        len(new_q) == 10 and len(ref_q) == 10
    refuse = (truncated(new_q, new_n) or truncated(ref_q, ref_n) or
              both_sides_short or both_undeclared_10)
    if "--allow-subset" in sys.argv:
        refuse = False
    if refuse:
        msg = (f"ref {ref_path} has {len(ref_q)} queries (declared "
               f"{ref_n}) vs {len(new_q)} new (declared {new_n}) — "
               f"a truncated stdout archive; use the full-map "
               f"BENCH_PREV.json / BENCH_LOCAL.json file")
        print(f"[bench-delta] {msg}", file=sys.stderr)
        with open("BENCH_DELTA.json", "w") as f:
            json.dump({"ref": ref_path, "new": new_path, "error": msg},
                      f, indent=1)
        return 2

    regressions, improvements = [], []
    for name, t in sorted(new_q.items()):
        r = ref_q.get(name)
        if r is None or r <= 0:
            continue
        if t >= 1.5 * r and t - r >= 0.3:
            regressions.append(
                {"query": name, "ref": r, "new": t, "ratio": round(t / r, 2)})
        elif r >= 1.5 * t and r - t >= 0.3:
            improvements.append(
                {"query": name, "ref": r, "new": t, "ratio": round(t / r, 2)})

    out = {
        "ref": ref_path, "new": new_path,
        "ref_total": ref_total, "new_total": new_total,
        "n_compared": sum(1 for q in new_q if q in ref_q),
        "n_new_queries": sum(1 for q in new_q if q not in ref_q),
        "regressions": regressions,
        "improvements": improvements,
    }

    # Self-contained adjudication (r19 verdict "what's wrong" #3): a
    # suite-gap flag adjudicated by an interleaved paired run used to
    # live only in SCALING.md prose, leaving the committed artifact
    # pair disagreeing with itself. `--paired=BENCH_PAIRED.json`
    # annotates each flagged query with its paired ratio (the
    # noise-controlled verdict) and records the pointer, so BENCH_DELTA
    # alone tells the whole story. The exit code still follows the raw
    # flags — the paired ratio explains, it does not suppress.
    paired_arg = next((a.split("=", 1)[1] for a in sys.argv[1:]
                       if a.startswith("--paired=")), None)
    if paired_arg and regressions:
        try:
            with open(paired_arg) as f:
                paired = json.load(f)
            pq = paired.get("queries", {})
            for e in regressions:
                pr = pq.get(e["query"])
                if isinstance(pr, dict) and pr.get("ratio") is not None:
                    e["paired_ratio"] = pr["ratio"]
            out["adjudicated"] = {
                "paired": paired_arg,
                "ref_label": paired.get("ref_label"),
                "median_ratio": paired.get("median_ratio"),
            }
        except FileNotFoundError:
            print(f"[bench-delta] --paired={paired_arg} not found; "
                  "emitting unadjudicated delta", file=sys.stderr)
    with open("BENCH_DELTA.json", "w") as f:
        json.dump(out, f, indent=1)
    if regressions:
        print(f"[bench-delta] {len(regressions)} regression(s) "
              f"(>=1.5x and >=0.3s):", file=sys.stderr)
        for e in regressions:
            print(f"  {e['query']}: {e['ref']:.2f}s -> {e['new']:.2f}s "
                  f"({e['ratio']}x)", file=sys.stderr)
    else:
        print(f"[bench-delta] no regressions across {out['n_compared']} "
              f"compared queries", file=sys.stderr)
    return 1 if regressions else 0


if __name__ == "__main__":
    sys.exit(main())
