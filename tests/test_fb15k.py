"""FB15K-237 preprocessing tests on a miniature fixture
(data_processing.py behavior: label conversion, graph detachment, re-iding,
file formats)."""

import os

import numpy as np
import pytest

from mpgnn_tpu.graph.fb15k import many_to_one_relations, preprocess_fb15k
from mpgnn_tpu.graph.io import load_fb15k237


@pytest.fixture
def mini_fb(tmp_path):
    d = str(tmp_path / "fb")
    os.makedirs(d)
    # entities e0..e5 + label destinations male/female
    with open(os.path.join(d, "FB15k_mid2name.txt"), "w") as f:
        for e in ["e0", "e1", "e2", "e3", "e4", "e5", "male", "female"]:
            f.write(f"/m/{e}\tname_{e}\n")
    triples = [
        ("/m/e0", "/r/gender", "/m/male"),
        ("/m/e1", "/r/gender", "/m/female"),
        ("/m/e2", "/r/gender", "/m/male"),
        ("/m/e0", "/r/knows", "/m/e1"),
        ("/m/e1", "/r/knows", "/m/e2"),
        ("/m/e3", "/r/likes", "/m/e4"),
        ("/m/e4", "/r/knows", "/m/e5"),
        ("/m/e2", "/r/likes", "/m/male"),   # touches a label dest -> dropped
    ]
    for fname, rows in [
        ("train.tsv", triples[:6]), ("test.tsv", triples[6:7]),
        ("dev.tsv", triples[7:]),
    ]:
        with open(os.path.join(d, fname), "w") as f:
            for s, r, o in rows:
                f.write(f"{s}\t{r}\t{o}\n")
    return d


def test_preprocess_fb15k(mini_fb, tmp_path):
    out = str(tmp_path / "out")
    res = preprocess_fb15k(mini_fb, "/r/gender", out_dir=out)
    # male/female removed from entity table
    assert res["num_entities"] == 6
    # gender triples + triples touching male/female are gone
    assert "/r/gender" not in res["relation_id"]
    assert len(res["labels"]) == 3  # e0, e1, e2
    # label ids: destinations sorted -> female=0, male=1
    labels = res["labels"]
    assert labels[0] == 1 and labels[1] == 0 and labels[2] == 1

    for f in ["link.dat", "node.dat", "label.dat", "relations_legend.dat"]:
        assert os.path.exists(os.path.join(out, f))

    # loadable by the standard loader
    graph, lab, binlabs, sources = load_fb15k237(
        os.path.join(out, "node.dat"),
        os.path.join(out, "link.dat"),
        os.path.join(out, "label.dat"),
    )
    assert graph.num_nodes == 6
    assert sorted(sources) == [0, 1, 2]
    # node features are zeros of dim |dests|+1 = 3
    assert graph.feat_dim == 3
    assert graph.x.sum() == 0.0


def test_many_to_one_relations(mini_fb):
    import pandas as pd

    frames = [
        pd.read_csv(
            os.path.join(mini_fb, f), sep="\t",
            names=["source_entity", "relation", "destination_entity"],
        )
        for f in ("train.tsv", "test.tsv", "dev.tsv")
    ]
    triplets = pd.concat(frames, ignore_index=True)
    m2o = many_to_one_relations(triplets)
    assert "/r/gender" in m2o   # every source appears once
