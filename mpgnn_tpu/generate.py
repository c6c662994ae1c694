"""Data-generation CLI (reference: data/run_data.sh + the synthetic
generator's argparse, create_graph_multi_metapath_deterministic.py:440-461,
and the FB15K preprocessor, data_processing.py:325-334).

    python -m mpgnn_tpu.generate synthetic --num_nodes 5000 \
        --max_rel_for_node 7 --metapath red-red-blue --overlap 0 \
        --shared_relations 0 --out data/synthetic/my_run
    python -m mpgnn_tpu.generate fb15k --path data/fb15k-237 \
        --relation /people/person/gender
"""

from __future__ import annotations

import argparse


def main(argv=None):
    ap = argparse.ArgumentParser(description="dataset generation")
    sub = ap.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("synthetic", help="planted-metapath synthetic graph")
    sp.add_argument("--num_nodes", type=int, required=True)
    sp.add_argument("--max_rel_for_node", type=int, required=True)
    sp.add_argument("--metapath", type=str, required=True)
    sp.add_argument("--overlap", type=int, default=0)
    sp.add_argument("--shared_relations", type=int, default=0)
    sp.add_argument("--metapath2", type=str, required=False)
    sp.add_argument("--metapath3", type=str, required=False)
    sp.add_argument("--multiclass", action="store_true",
                    help="one label class per planted path (plus background "
                         "class 0) instead of the reference's binary union")
    sp.add_argument("--seed", type=int, default=0)
    sp.add_argument("--out", type=str, required=True)

    fp = sub.add_parser("fb15k", help="FB15K-237 label-relation conversion")
    fp.add_argument("--path", type=str, required=True)
    fp.add_argument("--relation", type=str, required=True)
    fp.add_argument("--out", type=str, default=None)

    args = ap.parse_args(argv)
    if args.cmd == "synthetic":
        from mpgnn_tpu.graph.generate import generate_synthetic_graph

        g = generate_synthetic_graph(
            args.num_nodes, args.max_rel_for_node, args.metapath,
            overlap=args.overlap, shared_relations=args.shared_relations,
            seed=args.seed, out_dir=args.out, metapath2=args.metapath2,
            metapath3=args.metapath3, multiclass=args.multiclass,
        )
        extras = [g[k] for k in ("metapath2_relations", "metapath3_relations")
                  if g.get(k) is not None]
        print(
            f"wrote {args.out}: {args.num_nodes} nodes, {len(g['src'])} edges, "
            f"planted metapath (eval order) {g['metapath_relations']}"
            + (f" + extra paths {extras}" if extras else "")
            + (f", {len(set(g['labels'].tolist()))} classes"
               if args.multiclass else "")
        )
    else:
        from mpgnn_tpu.graph.fb15k import preprocess_fb15k

        res = preprocess_fb15k(args.path, args.relation, out_dir=args.out)
        extra = ""
        if res["label_mode"] == "continent":
            extra = f", continent counts {res['continent_counts']}"
        print(
            f"wrote {args.out or args.path}: {res['num_entities']} entities, "
            f"{len(res['src'])} links, {res['num_relations']} relations, "
            f"{len(res['labels'])} labels ({res['label_mode']} mode){extra}"
        )


if __name__ == "__main__":
    main()
