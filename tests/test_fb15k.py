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


@pytest.fixture
def mini_fb_continent(tmp_path):
    """Location-relation fixture: sources are cities, destinations are
    countries whose continent the offline table must resolve."""
    d = str(tmp_path / "fbc")
    os.makedirs(d)
    ents = {
        "paris": "Paris", "tokyo": "Tokyo", "lima": "Lima", "x1": "Xanadu_9",
        "fr": "France", "jp": "Japan", "pe": "Peru", "zz": "Atlantis_Land",
        "e0": "name_e0", "e1": "name_e1",
    }
    with open(os.path.join(d, "FB15k_mid2name.txt"), "w") as f:
        for mid, name in ents.items():
            f.write(f"/m/{mid}\t{name}\n")
    rel = "/base/biblioness/bibs_location/country"
    triples = [
        ("/m/paris", rel, "/m/fr"),
        ("/m/tokyo", rel, "/m/jp"),
        ("/m/lima", rel, "/m/pe"),
        ("/m/x1", rel, "/m/zz"),          # unknown location -> label 6
        ("/m/paris", "/r/knows", "/m/tokyo"),
        ("/m/e0", "/r/knows", "/m/e1"),
    ]
    with open(os.path.join(d, "train.tsv"), "w") as f:
        for s, r, o in triples:
            f.write(f"{s}\t{r}\t{o}\n")
    for fn in ("test.tsv", "dev.tsv"):
        open(os.path.join(d, fn), "w").close()
    return d


def test_preprocess_fb15k_continent_mode(mini_fb_continent, tmp_path):
    """The */continent pseudo-relation converts destinations to continent
    label ids via the offline table (data_processing.py:74-120 semantics:
    strip '/continent', resolve names, unknown -> 6)."""
    out = str(tmp_path / "outc")
    res = preprocess_fb15k(
        mini_fb_continent,
        "/base/biblioness/bibs_location/country/continent",
        out_dir=out,
    )
    assert res["label_mode"] == "continent"
    # country entities removed; label relation detached
    assert "/base/biblioness/bibs_location/country" not in res["relation_id"]
    # entity order: name-file order minus destinations ->
    # paris=0 tokyo=1 lima=2 x1=3 e0=4 e1=5
    labels = res["labels"]
    assert labels[0] == 0   # France -> EU
    assert labels[1] == 1   # Japan -> AS
    assert labels[2] == 2   # Peru -> SA
    assert labels[3] == 6   # Atlantis_Land -> unknown (failed geocode)
    assert res["continent_counts"] == {"EU": 1, "AS": 1, "SA": 1, None: 1}


def test_continent_of_table():
    from mpgnn_tpu.graph.continents import continent_of

    # reference hard-coded overrides (data_processing.py:105-108)
    assert continent_of("United_States_of_America") == "NA"
    assert continent_of("Republic_of_Macedonia") == "AS"
    assert continent_of("Palestinian_National_Authority") == "AS"
    # table + normalization + user overlay
    assert continent_of("Germany") == "EU"
    assert continent_of("new zealand") == "OC"
    assert continent_of("Texas") == "NA"
    assert continent_of("Nowhere") is None
    assert continent_of("Nowhere", extra={"Nowhere": "AF"}) == "AF"


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
