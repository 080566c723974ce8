#!/usr/bin/env python3
"""Diff the last two (or any two) BENCH_HISTORY.jsonl entries.

Usage: python3 tools/diff_history.py [BENCH_HISTORY.jsonl] [idxA idxB]

Compares per-query walls AND the streaming throughput map (r15 verdict
#2: 47 history entries carried walls but zero streaming rates, so the
windowed_dedup 7.5x collapse was not diffable from artifacts). Flags:
  - query walls moving >2x and >1 s in either direction;
  - streaming *_events_per_sec moving >1.5x in either direction;
  - *_insufficient_batches becoming nonzero;
  - *_batch_sec_late exceeding 2x *_batch_sec_early in the newer run
    (within-run batch-duration GROWTH -- the state-accretion signature
    a whole-window rate hides).
Exit 1 when anything is flagged, so it can gate a round close.
"""
import json
import sys


def load(path):
    with open(path) as f:
        return [json.loads(ln) for ln in f if ln.strip()]


def main(argv):
    path = argv[1] if len(argv) > 1 else "BENCH_HISTORY.jsonl"
    hist = load(path)
    if len(hist) < 2:
        print(f"{path}: {len(hist)} entries, nothing to diff")
        return 0
    if len(argv) == 3:
        sys.exit("need BOTH indices (idxA idxB) or neither; got one")
    ia, ib = (int(argv[2]), int(argv[3])) if len(argv) > 3 else (-2, -1)
    a, b = hist[ia], hist[ib]
    print(f"A: {a.get('wall_start')}  total {a.get('total_sec')} s  "
          f"load {a.get('load_avg_start')}->{a.get('load_avg_end')}")
    print(f"B: {b.get('wall_start')}  total {b.get('total_sec')} s  "
          f"load {b.get('load_avg_start')}->{b.get('load_avg_end')}")
    flagged = 0

    qa, qb = a.get("queries", {}), b.get("queries", {})
    for k in sorted(set(qa) & set(qb)):
        va, vb = qa[k], qb[k]
        if max(va, vb) > 2 * max(min(va, vb), 1e-9) and abs(va - vb) > 1.0:
            print(f"WALL   {k}: {va:.2f} -> {vb:.2f} s")
            flagged += 1

    sa, sb = a.get("streaming", {}), b.get("streaming", {})
    # Distinguish a pre-r16 entry (no "streaming" key at all -- note,
    # don't flag) from a post-r16 entry whose streaming leg FAILED or
    # was disabled ("streaming":{} -- Bench recovers a crashed leg to
    # an empty map). An empty newer map must flag: a vanished leg is
    # exactly the invisible-regression class this gate exists for.
    if "streaming" not in b:
        print("streaming: newer entry predates streaming history, skipped")
    elif not sb:
        print("STREAM streaming map EMPTY in newer entry "
              "(leg failed or disabled) -- no rates to compare")
        flagged += 1
    elif "streaming" not in a or not sa:
        print("streaming: no older baseline (pre-r16 or empty), skipped")
    for k in sorted(set(sa) & set(sb)):
        va, vb = sa[k], sb[k]
        if k.endswith("_events_per_sec"):
            if max(va, vb) > 1.5 * max(min(va, vb), 1e-9):
                print(f"STREAM {k}: {va/1e3:.1f}k -> {vb/1e3:.1f}k ev/s")
                flagged += 1
        elif k.endswith("_insufficient_batches") and vb > 0 >= va:
            print(f"STREAM {k}: became nonzero ({vb})")
            flagged += 1
    for k, vb in sorted(sb.items()):
        if k.endswith("_batch_sec_late"):
            early = sb.get(k.replace("_late", "_early"), 0.0)
            if early > 0 and vb > 2 * early:
                print(f"GROWTH {k}: early {early:.2f} s -> late {vb:.2f} s "
                      "(batch durations growing within the run)")
                flagged += 1

    print(f"\n{flagged} flagged")
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
