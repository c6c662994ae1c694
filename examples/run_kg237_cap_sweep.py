"""Beam-cap sensitivity on the 237-relation KG (VERDICT r4 item 7).

Round 4 completed the 2M-edge / 237-relation search only at
--max_extensions_per_state 8; the claim "recovery is cap-insensitive
because the planted relation scores loss 0.0 and survives any
lowest-loss cut" was demonstrated only on the 48-relation companion.
This driver runs caps {4, 16, 32} back-to-back through ONE resident
process (first-dispatch stall + program families paid once — the
VERDICT item-4 pattern), each with its own frontier checkpoint so a
tunnel death resumes mid-sweep:

    for i in 1 2 3 4 5; do \
        python examples/run_kg237_cap_sweep.py && break; done

Emits one JSON line per cap plus a summary table row for BASELINE.md.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--folder", default="data/powerlaw_kg")
    ap.add_argument("--caps", type=str, default="4,16,32")
    ap.add_argument("--prefix", type=str, default="/tmp/kg237_cap")
    ap.add_argument("--out", type=str, default="data/kg237_cap_sweep.json")
    args = ap.parse_args()

    import examples.run_powerlaw_kg as kg

    rows = []
    if os.path.exists(args.out):
        with open(args.out) as f:
            rows = json.load(f)
    done_caps = {r["cap"] for r in rows if r.get("ok")}

    for cap in [int(c) for c in args.caps.split(",")]:
        if cap in done_caps:
            print(f"cap {cap}: already recorded", file=sys.stderr)
            continue
        t0 = time.time()
        sys.argv = [
            "run_powerlaw_kg.py", "--folder", args.folder,
            "--backend", "csr",
            "--max_extensions_per_state", str(cap),
            "--frontier", f"{args.prefix}{cap}_frontier.pkl",
        ]
        import io
        from contextlib import redirect_stdout

        buf = io.StringIO()
        try:
            with redirect_stdout(buf):
                kg.main()
            ok = True
        except SystemExit as e:
            ok = (e.code or 0) == 0
        out_lines = [ln for ln in buf.getvalue().splitlines() if ln.strip()]
        print(buf.getvalue(), file=sys.stderr, flush=True)
        res = {}
        for ln in reversed(out_lines):
            try:
                res = json.loads(ln)
                break
            except Exception:
                continue
        rows.append({
            "cap": cap, "ok": ok, "wall_s": round(time.time() - t0, 1),
            "recovered": res.get("recovered"),
            "test_f1": res.get("test_f1"),
            "final_metapaths": res.get("final_metapaths"),
            "candidates_evaluated": res.get("candidates_evaluated"),
            "search_wall_s": res.get("search_wall_s"),
        })
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=1)
        print(json.dumps(rows[-1]), flush=True)
    print(json.dumps({"metric": "kg237_cap_sweep", "rows": rows}),
          flush=True)


if __name__ == "__main__":
    main()
