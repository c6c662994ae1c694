"""Standalone RGCN baseline runner.

Parity target: reference ``main_rgcn.py`` (550 LoC, single process): load a
dataset, train the plain all-relations RGCN ``Net`` (model.py:132-149) for
1000 epochs with CLASS-WEIGHTED NLL (main_rgcn.py:376-379 — unlike the
search path, the baseline applies balanced class weights), report macro-F1.

    python -m mpgnn_tpu.rgcn_baseline --folder <dir> --metapath_length 3
"""

from __future__ import annotations

import argparse
import logging
import sys

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mpgnn_tpu.config import MPGNNConfig
from mpgnn_tpu.graph.io import load_dat_files, load_fb15k237, mask_label_leak, split_nodes
from mpgnn_tpu.models.mpgnn import init_rgcn_net, rgcn_net_forward
from mpgnn_tpu.train.metrics import macro_f1
from mpgnn_tpu.train.loops import make_optimizer


def balanced_class_weights(y: np.ndarray, num_classes: int) -> np.ndarray:
    """sklearn 'balanced' weights: n / (C * bincount) (main_rgcn.py:376)."""
    counts = np.bincount(y, minlength=num_classes).astype(np.float64)
    counts[counts == 0] = 1.0
    return (len(y) / (num_classes * counts)).astype(np.float32)


def train_rgcn_baseline(
    graph,
    labels: np.ndarray,
    split,
    num_classes: int,
    metapath_length: int = 3,
    cfg: MPGNNConfig | None = None,
    seed: int = 10,          # main_rgcn.py:31 (torch.manual_seed(10))
    x_override: np.ndarray | None = None,
):
    cfg = cfg or MPGNNConfig()
    x = jnp.asarray(graph.x if x_override is None else x_override)
    src = jnp.asarray(graph.sorted_src)
    dst = jnp.asarray(graph.sorted_dst)
    et = jnp.asarray(graph.sorted_type)
    train_idx = jnp.asarray(split.train_idx)
    train_y = jnp.asarray(split.train_y)
    val_idx = jnp.asarray(split.val_idx)
    val_y = jnp.asarray(split.val_y)
    test_idx = jnp.asarray(split.test_idx)
    test_y = jnp.asarray(split.test_y)
    weights = jnp.asarray(
        balanced_class_weights(np.asarray(split.train_y), num_classes)
    )

    params = init_rgcn_net(
        jax.random.PRNGKey(seed), graph.feat_dim, cfg.hidden_dim,
        graph.num_relations, cfg.hidden_dim, num_classes,
        num_bases=cfg.num_bases, num_blocks=cfg.num_blocks,
    )
    tx = make_optimizer(cfg)

    def loss_fn(p):
        out = rgcn_net_forward(p, x, src, dst, et, metapath_length)
        logp = out[train_idx]
        per = -jnp.take_along_axis(logp, train_y[:, None], axis=1)[:, 0]
        w = weights[train_y]
        return jnp.sum(per * w) / jnp.sum(w)   # torch nll_loss weighted mean

    def epoch(carry, _):
        p, st = carry
        loss, g = jax.value_and_grad(loss_fn)(p)
        upd, st = tx.update(g, st, p)
        p = optax.apply_updates(p, upd)
        return (p, st), loss

    @jax.jit
    def run(p0):
        (p, _), losses = jax.lax.scan(
            epoch, (p0, tx.init(p0)), None, length=cfg.epochs
        )
        out = rgcn_net_forward(p, x, src, dst, et, metapath_length)
        preds = jnp.argmax(out, axis=1)
        return (
            p,
            macro_f1(preds[train_idx], train_y, num_classes),
            macro_f1(preds[val_idx], val_y, num_classes),
            macro_f1(preds[test_idx], test_y, num_classes),
            losses[-1],
        )

    p, f1_tr, f1_val, f1_te, loss = run(params)
    return {
        "params": p,
        "train_f1": float(f1_tr),
        "val_f1": float(f1_val),
        "test_f1": float(f1_te),
        "final_loss": float(loss),
    }


def main(argv=None):
    ap = argparse.ArgumentParser(description="plain RGCN baseline (TPU-native)")
    ap.add_argument("--folder", required=True)
    ap.add_argument("--dataset", default="synthetic")
    ap.add_argument("--node_file", default="node.dat")
    ap.add_argument("--link_file", default="link.dat")
    ap.add_argument("--label_file", default="label.dat")
    ap.add_argument("--metapath_length", type=int, default=3)
    ap.add_argument("--hidden_dim", type=int, default=64)
    ap.add_argument("--epochs", type=int, default=1000)
    ap.add_argument("--num_bases", type=int, default=None,
                    help="basis decomposition (mp_rgcn_layer.py:120-123)")
    ap.add_argument("--num_blocks", type=int, default=None,
                    help="block-diagonal decomposition (mp_rgcn_layer.py:125-131)")
    ap.add_argument("--platform", type=str, default=None)
    args = ap.parse_args(argv)
    logging.basicConfig(level=logging.INFO, stream=sys.stderr)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    folder = args.folder.rstrip("/") + "/"

    from mpgnn_tpu.utils.prof import enable_compilation_cache

    enable_compilation_cache()
    source_nodes = None
    if args.dataset == "fb15k-237":
        graph, labels, _, source_nodes = load_fb15k237(
            folder + args.node_file, folder + args.link_file,
            folder + args.label_file,
        )
    else:
        graph, labels, _ = load_dat_files(
            folder + args.node_file, folder + args.link_file,
            folder + args.label_file,
        )
    split = split_nodes(labels, node_idx=source_nodes)
    x = graph.x
    if args.dataset == "fb15k-237":
        x = mask_label_leak(graph.x, split)   # main_rgcn.py:41-48, :503
    num_classes = int(len(np.unique(labels)))
    res = train_rgcn_baseline(
        graph, labels, split, num_classes, args.metapath_length,
        MPGNNConfig(epochs=args.epochs, hidden_dim=args.hidden_dim,
                    num_bases=args.num_bases, num_blocks=args.num_blocks),
        x_override=x,
    )
    print(
        f"train F1 {res['train_f1']:.4f} val F1 {res['val_f1']:.4f} "
        f"test F1 {res['test_f1']:.4f} loss {res['final_loss']:.4f}"
    )
    return res


if __name__ == "__main__":
    main()
