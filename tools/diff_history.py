#!/usr/bin/env python3
"""Diff the last two (or any two) BENCH_HISTORY.jsonl entries.

Usage: python3 tools/diff_history.py [BENCH_HISTORY.jsonl] [idxA idxB]

A numeric first argument is treated as idxA (the history path defaults),
so `diff_history.py 2 3` diffs entries 2 and 3 of the default file
(r16 ADVICE #4: it used to treat '2' as the history path and die with
FileNotFoundError). Indices may be negative (python semantics); out of
range exits with a usage message, not a bare IndexError.

Compares per-query walls AND the streaming throughput map (r15 verdict
#2: 47 history entries carried walls but zero streaming rates, so the
windowed_dedup 7.5x collapse was not diffable from artifacts). Flags:
  - query walls moving >2x and >1 s in either direction;
  - streaming *_events_per_sec moving >1.5x in either direction --
    UNLESS every rate leg moved together in the same direction
    (lockstep), in which case the move is classified ENVIRONMENT and
    printed as a note: the stateless tokenize leg has no state to
    accrete, so it slowing in step with the stateful legs can only be
    the host, not the engine (r16 verdict #5 -- this was adjudicated by
    hand in r16; now the tool does it). One leg moving alone (or legs
    moving in opposite directions) stays ENGINE-SUSPECT and flags.
  - *_insufficient_batches becoming nonzero;
  - *_batch_sec_late exceeding 2x *_batch_sec_early in the newer run
    (within-run batch-duration GROWTH -- the state-accretion signature
    a whole-window rate hides).
Exit 1 when anything is flagged, so it can gate a round close.
"""
import json
import sys

USAGE = ("usage: diff_history.py [BENCH_HISTORY.jsonl] [idxA idxB]\n"
         "  (a numeric first arg is idxA; indices may be negative;"
         " give both or neither)")


def load(path):
    try:
        with open(path) as f:
            return [json.loads(ln) for ln in f if ln.strip()]
    except OSError as e:
        sys.exit(USAGE + f"\n  cannot read history file: {e}")


def is_int(s):
    try:
        int(s)
        return True
    except ValueError:
        return False


def parse_args(argv):
    path, rest = "BENCH_HISTORY.jsonl", argv[1:]
    if rest and not is_int(rest[0]):
        path, rest = rest[0], rest[1:]
    if any(not is_int(a) for a in rest) or len(rest) not in (0, 2):
        sys.exit(USAGE + f"\n  got: {argv[1:]}")
    idx = tuple(int(a) for a in rest) if rest else (-2, -1)
    return path, idx


def classify_streaming(sa, sb):
    """Per-leg rate moves + the lockstep discriminator.

    Returns (moves, classification) where moves is
    [(key, va, vb, direction)] for legs moving >1.5x and classification
    is None (nothing moved), 'environment_lockstep' (every common rate
    leg moved the same direction, >=2 legs), or 'engine_suspect'.
    """
    rate_keys = sorted(k for k in set(sa) & set(sb)
                       if k.endswith("_events_per_sec"))
    moves, directions = [], {}
    for k in rate_keys:
        va, vb = sa[k], sb[k]
        if vb < va / 1.5:
            directions[k] = "down"
            moves.append((k, va, vb, "down"))
        elif vb > 1.5 * max(va, 1e-9):
            directions[k] = "up"
            moves.append((k, va, vb, "up"))
        else:
            directions[k] = "steady"
    if not moves:
        return moves, None
    dirs = set(directions.values())
    if len(rate_keys) >= 2 and dirs in ({"down"}, {"up"}):
        return moves, "environment_lockstep"
    return moves, "engine_suspect"


def main(argv):
    path, (ia, ib) = parse_args(argv)
    hist = load(path)
    if len(hist) < 2:
        print(f"{path}: {len(hist)} entries, nothing to diff")
        return 0
    for i in (ia, ib):
        if not -len(hist) <= i < len(hist):
            sys.exit(USAGE + f"\n  index {i} out of range for {len(hist)}"
                     f" entries in {path}")
    a, b = hist[ia], hist[ib]
    wqa = a.get("window_quality", "unknown")
    wqb = b.get("window_quality", "unknown")
    print(f"A: {a.get('wall_start')}  total {a.get('total_sec')} s  "
          f"load {a.get('load_avg_start')}->{a.get('load_avg_end')}  "
          f"window {wqa}")
    print(f"B: {b.get('wall_start')}  total {b.get('total_sec')} s  "
          f"load {b.get('load_avg_start')}->{b.get('load_avg_end')}  "
          f"window {wqb}")
    flagged = 0

    # Walls measured in a DEGRADED window are environment artifacts, not
    # engine numbers (r16 verdict #3: the committed 492.8 s headline came
    # from a load-7 window, 40% above four same-day quiet runs) -- the
    # entry self-declares via window_quality, so wall moves against or
    # from such a window print as notes, with a quiet-rerun reminder,
    # instead of failing the gate. Streaming moves keep their own
    # lockstep discriminator below.
    degraded = "degraded" in (wqa, wqb)
    if degraded:
        print("note   a compared window is DEGRADED -- wall moves below "
              "are environment-classified; adjudicate with a quiet rerun")
    qa, qb = a.get("queries", {}), b.get("queries", {})
    for k in sorted(set(qa) & set(qb)):
        va, vb = qa[k], qb[k]
        if max(va, vb) > 2 * max(min(va, vb), 1e-9) and abs(va - vb) > 1.0:
            if degraded:
                print(f"note   {k}: {va:.2f} -> {vb:.2f} s (degraded window)")
            else:
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
    moves, classification = classify_streaming(sa, sb)
    if classification == "environment_lockstep":
        # All rate legs (incl. the STATELESS tokenize leg, which has no
        # state to accrete) moved together: host-window noise, not the
        # engine. Print as notes -- an environment-classified move must
        # not fail a round-close gate the way an engine move does.
        print(f"CLASS  streaming_degradation: environment_lockstep "
              f"({len(moves)} legs moved {moves[0][3]} together)")
        for k, va, vb, d in moves:
            print(f"note   {k}: {va/1e3:.1f}k -> {vb/1e3:.1f}k ev/s "
                  f"({d}, lockstep)")
    elif classification == "engine_suspect":
        movedks = ", ".join(k for k, _, _, _ in moves)
        print(f"CLASS  streaming_degradation: engine_suspect "
              f"({movedks} moved while other legs held)")
        for k, va, vb, d in moves:
            print(f"STREAM {k}: {va/1e3:.1f}k -> {vb/1e3:.1f}k ev/s ({d})")
            flagged += 1
    for k in sorted(set(sa) & set(sb)):
        va, vb = sa[k], sb[k]
        if k.endswith("_insufficient_batches") and vb > 0 >= va:
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
