"""FB15K-237 preprocessing — behavioral port of the reference's
``data/fb15k-237/data_processing.py`` (:27-323): convert a chosen
many-to-one relation into node labels, detach the label relation from the
graph, re-id entities/relations, and build optional BoW+PCA text features.

Differences from the reference, by necessity or determinism:
* relation re-iding uses sorted order (the reference iterates a Python set,
  whose order varies with hash seed; data_processing.py:191-195) — the
  shipped ``relations_legend.dat`` records whatever mapping a given run used.
* continent labels (data_processing.py:19-26, :74-120): the reference
  geocodes destination names through the geonames web service; zero egress
  here, so the SAME conversion path runs against the shipped offline
  name->continent table (``graph.continents``), with the reference's
  hard-coded overrides and the failed-geocode->label-6 behavior preserved.
* NLTK stopwords/lemmatization degrade gracefully to regex tokenization when
  the NLTK corpora are not downloaded (zero-egress environment).
"""

from __future__ import annotations

import os
import re
from typing import Dict, List, Optional

import numpy as np


def load_triplet_files(path: str):
    """Read train/test/dev TSVs + entity names (data_processing.py:35-43)."""
    import pandas as pd

    names = pd.read_csv(
        os.path.join(path, "FB15k_mid2name.txt"), sep="\t",
        names=["entity", "name"],
    )
    frames = []
    for f in ("train.tsv", "test.tsv", "dev.tsv"):
        fp = os.path.join(path, f)
        if os.path.exists(fp):
            frames.append(
                pd.read_csv(
                    fp, sep="\t",
                    names=["source_entity", "relation", "destination_entity"],
                )
            )
        else:
            # the upstream snapshot ships without train.tsv (a missing large
            # blob); proceed with whatever splits exist
            import warnings

            warnings.warn(f"{fp} missing; continuing without it")
    if not frames:
        raise FileNotFoundError(f"no triplet TSVs found under {path}")
    triplets = pd.concat(frames, axis=0, ignore_index=True)
    return names, triplets


def many_to_one_relations(triplets) -> List[str]:
    """Relations whose source entities are all distinct — the candidates for
    label conversion (data_processing.py:45-51)."""
    grouped = triplets.groupby("relation")["source_entity"].agg(list)
    return [r for r, srcs in grouped.items() if len(srcs) == len(set(srcs))]


def preprocess_fb15k(
    path: str,
    relation: str,
    out_dir: Optional[str] = None,
    descriptions_file: str = "entity2textlong.txt",
    bow_components: int = 100,
    continent_table: Optional[Dict[str, str]] = None,
) -> Dict[str, object]:
    """Full preprocessing pipeline. Writes link.dat / node.dat / label.dat /
    relations_legend.dat (+ node_bow.dat when descriptions exist) in the
    reference formats; returns the in-memory arrays.

    When ``relation`` is one of the three ``*/continent`` pseudo-relations
    (CONTINENT_RELATIONS), labels are CONTINENT ids of the underlying
    location relation's destinations (data_processing.py:74-120): the
    trailing ``/continent`` is stripped, each destination entity's *name*
    resolves to a continent code via the shipped offline table
    (``graph.continents``, replacing the reference's geonames calls), and
    sources get CONTINENT_IDS[code] (unknown -> 6, like a failed geocode).
    ``continent_table`` overlays extra name->code entries."""
    import pandas as pd

    out_dir = out_dir or path
    names, triplets = load_triplet_files(path)

    continent_mode = relation in CONTINENT_RELATIONS
    if continent_mode:
        # the pseudo-relation names the label semantics; the graph relation
        # is the prefix (data_processing.py:75)
        relation = relation[: -len("/continent")]

    # labels = destination of the chosen relation per source entity
    # (data_processing.py:122-135); in continent mode, the destination's
    # continent id instead (:102-113)
    filtered = triplets[triplets["relation"] == relation]
    possible_destinations = sorted(set(filtered["destination_entity"]))
    dest_id = {d: i for i, d in enumerate(possible_destinations)}
    continent_counts: Dict[object, int] = {}
    if continent_mode:
        from mpgnn_tpu.graph.continents import continent_of

        name_of = dict(zip(names["entity"], names["name"]))
        labels_by_entity = {}
        for row in filtered.itertuples():
            code = continent_of(
                str(name_of.get(row.destination_entity, "")),
                extra=continent_table,
            )
            labels_by_entity[row.source_entity] = CONTINENT_IDS[code]
            continent_counts[code] = continent_counts.get(code, 0) + 1
    else:
        labels_by_entity = {
            row.source_entity: dest_id[row.destination_entity]
            for row in filtered.itertuples()
        }

    # "link unlinked nodes" quirk (data_processing.py:153-164): for every
    # triplet whose source is a label destination entity, append one copy of
    # that triplet per labeled source entity.
    source_entities = sorted(set(filtered["source_entity"]))
    dest_set = set(possible_destinations)
    extra = []
    for row in triplets.itertuples():
        if row.source_entity in dest_set:
            for elm in source_entities:
                extra.append((elm, row.relation, row.destination_entity))
    if extra:
        triplets = pd.concat(
            [
                triplets,
                pd.DataFrame(
                    extra,
                    columns=["source_entity", "relation", "destination_entity"],
                ),
            ],
            ignore_index=True,
        )

    # drop the label relation and every triple touching its destination
    # entities (data_processing.py:171-173)
    triplets = triplets[triplets["relation"] != relation]
    triplets = triplets[~triplets["destination_entity"].isin(dest_set)]
    triplets = triplets[~triplets["source_entity"].isin(dest_set)]

    # entity re-id: original name-file order minus removed entities
    # (data_processing.py:167-180)
    entities = names[~names["entity"].isin(dest_set)].reset_index(drop=True)
    entity_id = {e: i for i, e in enumerate(entities["entity"])}

    # relation re-id (sorted for determinism; see module docstring)
    relation_list = sorted(set(triplets["relation"]))
    relation_id = {r: i for i, r in enumerate(relation_list)}

    src = np.array([entity_id[e] for e in triplets["source_entity"]])
    rel = np.array([relation_id[r] for r in triplets["relation"]])
    dst = np.array([entity_id[e] for e in triplets["destination_entity"]])

    labels = {
        entity_id[e]: v for e, v in labels_by_entity.items() if e in entity_id
    }
    feat_dim = len(possible_destinations) + 1
    num_entities = len(entities)

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "link.dat"), "w") as f:
        for s, r, d in zip(src, rel, dst):
            f.write(f"{s}\t{r}\t{d}\n")
    with open(os.path.join(out_dir, "node.dat"), "w") as f:
        # zero features of dimension |destinations|+1 (the reference's
        # one-hot fill is commented out; data_processing.py:176-188)
        zeros = "\t".join(["0.0"] * feat_dim)
        for i in range(num_entities):
            f.write(f"{i}\t{zeros}\t\n")
    with open(os.path.join(out_dir, "label.dat"), "w") as f:
        for k, v in labels.items():
            f.write(f"{k}\t{v}\n")
    with open(os.path.join(out_dir, "relations_legend.dat"), "w") as f:
        for r, i in relation_id.items():
            f.write(f"{r}\t{i}\n")

    desc_path = os.path.join(path, descriptions_file)
    if os.path.exists(desc_path) and os.path.getsize(desc_path) > 100:
        bow = build_bow_features(
            desc_path, entity_id, num_entities, bow_components
        )
        with open(os.path.join(out_dir, "node_bow.dat"), "w") as f:
            for i in range(num_entities):
                f.write(
                    str(i) + "\t"
                    + "\t".join(str(v) for v in bow[i]) + "\t\n"
                )

    return {
        "src": src, "rel": rel, "dst": dst,
        "labels": labels,
        "num_entities": num_entities,
        "num_relations": len(relation_list),
        "relation_id": relation_id,
        "many_to_one": many_to_one_relations(triplets),
        "label_mode": "continent" if continent_mode else "destination",
        "continent_counts": continent_counts,
    }


def _simple_preprocess(text: str) -> str:
    """Text cleanup (data_processing.py:262-281), degrading gracefully when
    NLTK corpora are unavailable offline."""
    text = re.sub(r"[^\w\s]", "", text).lower()
    try:
        from nltk.corpus import stopwords
        from nltk.stem import WordNetLemmatizer
        from nltk.tokenize import word_tokenize

        stop = set(stopwords.words("english"))
        toks = [w for w in word_tokenize(text) if w not in stop]
        lem = WordNetLemmatizer()
        return " ".join(lem.lemmatize(t) for t in toks)
    except Exception:
        return " ".join(text.split())


def build_bow_features(
    desc_path: str,
    entity_id: Dict[str, int],
    num_entities: int,
    num_components: int = 100,
) -> np.ndarray:
    """BoW + PCA text features (data_processing.py:293-321): CountVectorizer
    over preprocessed descriptions, PCA to ``num_components`` dims; entities
    without descriptions get zero vectors."""
    import pandas as pd
    from sklearn.decomposition import PCA
    from sklearn.feature_extraction.text import CountVectorizer

    df = pd.read_csv(desc_path, sep="\t", names=["entity", "description"])
    df = df[df["entity"].isin(entity_id)]
    ids = [entity_id[e] for e in df["entity"]]
    texts = [_simple_preprocess(t) for t in df["description"].fillna("")]
    vec = CountVectorizer()
    bow = vec.fit_transform(texts)
    n_comp = min(num_components, bow.shape[0], bow.shape[1])
    pca = PCA(n_components=n_comp)
    reduced = pca.fit_transform(bow.toarray())
    out = np.zeros((num_entities, n_comp), dtype=np.float64)
    out[ids] = reduced
    return out


CONTINENT_IDS = {  # data_processing.py:84-92
    "EU": 0, "AS": 1, "SA": 2, "NA": 3, "AF": 4, "OC": 5, None: 6
}

# the three location relations whose labels geocode to continents
# (data_processing.py:74)
CONTINENT_RELATIONS = (
    "/base/biblioness/bibs_location/country/continent",
    "/base/biblioness/bibs_location/state/continent",
    "/people/person/place_of_birth/continent",
)
