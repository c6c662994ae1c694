"""Inference/serving for trained metapath models.

The reference stops at printing test F1 (main.py:1476); production use needs
the discovered metapaths + trained parameters to serve predictions. This
module loads a model saved by ``run.py --save_model`` (orbax) together with
its metapath set and exposes a jitted full-graph predictor plus a CLI:

    python -m mpgnn_tpu.serve --model_dir models/class_0 \
        --metapaths "[[1, 0]]" --folder <dataset_dir> --nodes 17,42,99
"""

from __future__ import annotations

import argparse
import json
import sys
from typing import List, Optional, Sequence

import numpy as np


class MetapathPredictor:
    """Jitted full-graph node classifier for a discovered metapath set."""

    def __init__(
        self,
        graph,
        metapaths: Sequence[Sequence[int]],
        params,
        x_override: Optional[np.ndarray] = None,
        backend: str = "segment",
    ):
        import jax
        import jax.numpy as jnp

        from mpgnn_tpu.models.mpgnn import mpgnn_forward
        from mpgnn_tpu.train.loops import (
            build_hop_arrays,
            retag_hop_ops,
            split_hop_ops,
        )

        self.graph = graph
        self.metapaths = [list(m) for m in metapaths]
        self.params = params
        x = jnp.asarray(graph.x if x_override is None else x_override)
        hop_ops = build_hop_arrays(graph, self.metapaths, backend=backend)
        kinds, data = split_hop_ops(hop_ops)

        @jax.jit
        def _predict(params, data):
            ops = retag_hop_ops(kinds, data)
            return mpgnn_forward(params, x, ops, train=False)

        self._predict = _predict
        self._data = data
        self._logp = None

    def log_probs(self) -> np.ndarray:
        """[N, C] log-probabilities for every node (cached)."""
        if self._logp is None:
            self._logp = np.asarray(self._predict(self.params, self._data))
        return self._logp

    def refresh(self) -> float:
        """Re-run the jitted full-graph forward (e.g. after a params/
        feature update) and return the dispatch latency in seconds — the
        serving-side refresh cost a latency SLO budgets for."""
        import time

        t0 = time.perf_counter()
        self._logp = np.asarray(self._predict(self.params, self._data))
        return time.perf_counter() - t0

    def predict(self, node_ids: Optional[Sequence[int]] = None) -> np.ndarray:
        lp = self.log_probs()
        preds = lp.argmax(axis=1)
        if node_ids is None:
            return preds
        return preds[np.asarray(list(node_ids), dtype=np.int64)]

    @classmethod
    def load(
        cls,
        model_dir: str,
        graph,
        metapaths: Sequence[Sequence[int]],
        num_classes: int,
        hidden_dim: int = 64,
        **kwargs,
    ) -> "MetapathPredictor":
        """Restore parameters saved by run.py --save_model."""
        import jax

        from mpgnn_tpu.models.mpgnn import init_mpgnn
        from mpgnn_tpu.utils.checkpoint import restore_params

        template = init_mpgnn(
            jax.random.PRNGKey(0), graph.feat_dim, hidden_dim,
            num_classes, [list(m) for m in metapaths],
        )
        params = restore_params(model_dir, template)
        return cls(graph, metapaths, params, **kwargs)


def main(argv=None):
    ap = argparse.ArgumentParser(description="metapath model serving")
    ap.add_argument("--model_dir", required=True)
    ap.add_argument("--metapaths", required=True,
                    help='JSON list of metapaths, e.g. "[[1, 0]]"')
    ap.add_argument("--folder", required=True)
    ap.add_argument("--node_file", default="node.dat")
    ap.add_argument("--link_file", default="link.dat")
    ap.add_argument("--label_file", default="label.dat")
    ap.add_argument("--hidden_dim", type=int, default=64)
    ap.add_argument("--num_classes", type=int, default=2)
    ap.add_argument("--nodes", type=str, default=None,
                    help="comma-separated node ids (default: all)")
    ap.add_argument("--platform", type=str, default=None)
    args = ap.parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from mpgnn_tpu.utils.prof import enable_compilation_cache

    enable_compilation_cache()

    from mpgnn_tpu.graph.io import load_dat_files

    folder = args.folder.rstrip("/") + "/"
    graph, _, _ = load_dat_files(
        folder + args.node_file, folder + args.link_file,
        folder + args.label_file,
    )
    metapaths = json.loads(args.metapaths)
    pred = MetapathPredictor.load(
        args.model_dir, graph, metapaths, args.num_classes, args.hidden_dim
    )
    ids: Optional[List[int]] = None
    if args.nodes:
        ids = [int(v) for v in args.nodes.split(",")]
    out = pred.predict(ids)
    if ids is None:
        print(json.dumps({"num_nodes": len(out),
                          "class_counts": np.bincount(out).tolist()}))
    else:
        print(json.dumps({str(i): int(c) for i, c in zip(ids, out)}))


if __name__ == "__main__":
    main()
