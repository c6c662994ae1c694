#!/usr/bin/env bash
# One-command reproduction harness (VERDICT r4 item 8).
#
# Regenerates every shipped dataset and re-runs every BASELINE.md experiment
# row under the production retry pattern (--retries / retry loops + frontier
# checkpoints), rewriting the structured-JSON artifacts under $REPRO_OUT
# (default repro_out/). The reference's equivalent is run.sh + data/run_data.sh
# (/root/reference/run.sh:1-32); here every row is one subcommand:
#
#   bash repro.sh datasets     # regenerate all shipped datasets (CPU, ~2 min)
#   bash repro.sh tests        # FULL test suite (CPU, ~10 min)
#   bash repro.sh verify       # tiny end-to-end CPU search (~1 min)
#   bash repro.sh bench        # bench.py on the real TPU
#   bash repro.sh multiclass   # 3-class full-budget search + resume (TPU)
#   bash repro.sh kg_small     # 48-relation 1M-edge KG search (TPU)
#   bash repro.sh kg237        # 237-relation 2M-edge KG search, beam 8 (TPU)
#   bash repro.sh fb15k        # FB15K-237 continent-mode 4-class search (TPU)
#   bash repro.sh scaling      # virtual-mesh scaling sweep (CPU)
#   bash repro.sh ooc100m      # 100M-edge out-of-core training (TPU; ~10 GB disk)
#   bash repro.sh serve        # KG serving example + latency row (TPU)
#   bash repro.sh all          # everything above, in order
#
# Every TPU run survives tunnel-worker deaths: the retry loops resume from
# frontier/per-chunk checkpoints (docs/DESIGN.md §"tunnel pathology").
set -u
cd "$(dirname "$0")"
OUT=${REPRO_OUT:-repro_out}
mkdir -p "$OUT"
PY=${PYTHON:-python}

note() { echo "[repro] $*" >&2; }

run_retry() {  # run_retry <name> <max_attempts> <cmd...>
    local name=$1 tries=$2; shift 2
    local i rc
    for i in $(seq 1 "$tries"); do
        note "$name: attempt $i/$tries"
        "$@" >>"$OUT/$name.log" 2>&1
        rc=$?
        [ $rc -eq 0 ] && { note "$name: done"; return 0; }
        note "$name: rc=$rc; retrying (checkpoints resume)"
        sleep 10
    done
    note "$name: FAILED after $tries attempts"
    return 1
}

datasets() {
    note "datasets: regenerating shipped datasets"
    $PY -m mpgnn_tpu.generate synthetic --num_nodes 5000 \
        --max_rel_for_node 7 --metapath red-red-blue \
        --metapath2 blue-blue-red --multiclass --seed 21 \
        --out data/synthetic_multiclass
    $PY -m mpgnn_tpu.generate powerlaw --num_nodes 100000 \
        --num_edges 1000000 --num_relations 48 --metapath_len 3 \
        --seed 7 --out data/powerlaw_kg_small
    $PY -m mpgnn_tpu.generate powerlaw --num_nodes 200000 \
        --num_edges 2000000 --num_relations 237 --metapath_len 3 \
        --seed 5 --out data/powerlaw_kg
    # FB15K-237 conversions need the upstream snapshot's raw TSVs
    if [ -d /root/reference/data/fb15k-237 ]; then
        $PY -m mpgnn_tpu.generate fb15k \
            --path /root/reference/data/fb15k-237 \
            --relation /people/person/gender --out data/fb15k-237
        $PY -m mpgnn_tpu.generate fb15k \
            --path /root/reference/data/fb15k-237 \
            --relation /people/person/place_of_birth/continent \
            --out data/fb15k-237-continent
    else
        note "datasets: /root/reference/data/fb15k-237 absent — skipping the two FB15K conversions"
    fi
}

tests() {
    note "tests: full suite (slow + default)"
    $PY -m pytest tests/ -q -m "slow or not slow" 2>&1 | tee "$OUT/tests.log" | tail -2
}

verify() {
    note "verify: tiny end-to-end CPU search"
    $PY -m mpgnn_tpu.generate synthetic --num_nodes 500 --max_rel_for_node 4 \
        --metapath red-red-blue --seed 3 --out "$OUT/verify_ds"
    $PY -m mpgnn_tpu.run --platform cpu --hidden_dim 16 --dataset synthetic \
        --folder "$OUT/verify_ds" --node_file node.dat --link_file link.dat \
        --label_file label.dat --epochs 60 --max_hops 2 \
        2>"$OUT/verify.log" | tee "$OUT/verify.json"
}

bench() {
    note "bench: real-TPU benchmark harness"
    $PY bench.py 2>"$OUT/bench.log" | tee "$OUT/bench.json"
}

multiclass() {
    run_retry multiclass 3 $PY examples/run_multiclass_full_budget.py
}

kg_small() {
    run_retry kg_small 5 $PY examples/run_powerlaw_kg.py \
        --folder data/powerlaw_kg_small --backend csr \
        --frontier "$OUT/kg_small_frontier.pkl"
    tail -1 "$OUT/kg_small.log" > "$OUT/kg_small.json" || true
}

kg237() {
    run_retry kg237 8 $PY examples/run_powerlaw_kg.py \
        --folder data/powerlaw_kg --backend csr \
        --max_extensions_per_state 8 \
        --frontier "$OUT/kg237_frontier.pkl"
    tail -1 "$OUT/kg237.log" > "$OUT/kg237.json" || true
}

fb15k() {
    # continent label mode, 4 one-vs-rest classes, full budgets
    # (BASELINE.md round-4 row); node.dat comes from `datasets`
    [ -f data/fb15k-237-continent/node.dat ] || {
        note "fb15k: node.dat missing — run 'bash repro.sh datasets' first"
        return 1
    }
    $PY -m mpgnn_tpu.run --retries 5 --hidden_dim 64 --dataset fb15k-237 \
        --folder data/fb15k-237-continent --node_file node.dat \
        --link_file link.dat --label_file label.dat \
        --bag_gap_inclusive --max_extensions_per_state 8 --backend csr \
        --frontier "$OUT/fb15k_cont_frontier" \
        --pickle_filename "$OUT/fb15k_cont_results.pkl" \
        2>>"$OUT/fb15k.log" | tee "$OUT/fb15k.json"
}

scaling() {
    note "scaling: virtual-mesh sweep (CPU)"
    $PY bench_scaling.py --train --out "$OUT/SCALING.json" \
        2>&1 | tee "$OUT/scaling.log" | tail -3
}

ooc100m() {
    if [ ! -f data/powerlaw_kg_100m/meta.json ]; then
        note "ooc100m: generating the 100M-edge KG (~3 GB, a few minutes)"
        $PY -m mpgnn_tpu.generate powerlaw --num_nodes 2000000 \
            --num_edges 100000000 --num_relations 16 --metapath_len 2 \
            --seed 17 --out data/powerlaw_kg_100m --format npy \
            2>&1 | tee -a "$OUT/ooc100m.log"
    fi
    run_retry ooc100m 3 $PY examples/ooc_kg_100m.py \
        --folder data/powerlaw_kg_100m
    grep -h '"metric"' "$OUT/ooc100m.log" | tail -1 > "$OUT/ooc100m.json" || true
}

serve() {
    run_retry serve 3 $PY examples/serve_kg_model.py
}

all() {
    datasets && tests && verify && bench && multiclass && kg_small \
        && kg237 && fb15k && scaling && ooc100m && serve
}

cmd=${1:-help}
case "$cmd" in
    datasets|tests|verify|bench|multiclass|kg_small|kg237|fb15k|scaling|ooc100m|serve|all)
        "$cmd" ;;
    *)
        sed -n '2,26p' "$0"; exit 1 ;;
esac
