"""Amazon Fashion reviews dataset — the text+tabular family.

Rebuilds ``src/datasets/amazon_fashion.py`` (and repairs its stale mask API
— the reference imports a removed ``apply_mask`` and calls ``create_mask``
with the wrong arity, ``amazon_fashion.py:21,131``; SURVEY §2 item 32, so it
is commented out of the reference's ``__init__``). Schema (``:109-118``):
``verified``/``reviewerID``/``asin`` categorical, ``unixReviewTime``
timestamp, ``vote`` numerical, ``reviewText``/``summary`` text columns,
``overall`` rating target (regression). Graph: reviewer → asin bipartite.

Text columns are materialized either as ``text_embedded`` (a frozen
embedder runs once over the corpus at materialization — the
``TextEmbedderConfig`` path) or ``text_tokenized`` (token ids stored; a
trainable encoder consumes them inside the forward pass — the
``TextTokenizerConfig`` path).
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pandas as pd

from ..frame.stype import Stype
from ..nn.text import HashingTokenizer, get_text_embedder
from .graph_dataset import EdgeTable, GraphTableDataset, NodeTable

TEXT_COLS = ("reviewText", "summary")


class AmazonFashionDataset(GraphTableDataset):
    def __init__(self, root: str, mask_type: str = "replace",
                 pretrain: Optional[set] = None,
                 split_type: str = "temporal",
                 splits: Sequence[float] = (0.6, 0.2, 0.2),
                 khop_neighbors=(100, 100),
                 text_stype: Stype = Stype.text_embedded,
                 text_embedder=None, tokenizer=None,
                 channels: int = 64, ports: bool = False, ego: bool = False,
                 edge_capacity: int = 0, node_capacity: int = 0,
                 use_native_sampler: bool = True):
        df = pd.read_csv(root, header=0)
        assert text_stype in (Stype.text_embedded, Stype.text_tokenized)

        # reviewer/asin ids → one global id space (bipartite)
        rev = df["reviewerID"].astype(str)
        asin = "a_" + df["asin"].astype(str)
        codes = pd.concat([rev, asin]).astype("category").cat.codes
        n = len(df)
        df["reviewer_node"] = codes[:n].to_numpy().astype(np.int64)
        df["asin_node"] = codes[n:].to_numpy().astype(np.int64)

        # materialize text columns
        if text_stype == Stype.text_embedded:
            embedder = text_embedder or get_text_embedder("hashing", dim=128)
            for c in TEXT_COLS:
                if c in df.columns:
                    emb = embedder(df[c].fillna("").tolist())
                    df[c] = list(emb)
        else:
            tok = tokenizer or HashingTokenizer()
            for c in TEXT_COLS:
                if c in df.columns:
                    ids = tok(df[c].fillna("").tolist())
                    df[c] = list(ids)

        schema = {
            "verified": Stype.categorical,
            "reviewerID": Stype.categorical,
            "asin": Stype.categorical,
            "unixReviewTime": Stype.timestamp,
            "vote": Stype.numerical,
        }
        for c in TEXT_COLS:
            if c in df.columns:
                schema[c] = text_stype

        edges = EdgeTable(
            df, schema, src_col="reviewer_node", dst_col="asin_node",
            timestamp_col="unixReviewTime",
            supervised_col="overall" if not pretrain else None,
            masked_numerical_columns=["vote"],
            masked_categorical_columns=["verified"],
            pretrain=pretrain, split_type=split_type, splits=splits,
            khop_neighbors=khop_neighbors, ports=ports, cache_root=root,
            mask_type=mask_type, use_native_sampler=use_native_sampler)
        nodes = NodeTable.synthetic(edges.graph.num_nodes - 1, ego=ego)
        super().__init__(edges, nodes, edge_capacity, node_capacity)
        self.n_classes = 1  # regression on the rating


def retrieve_dataset(json_path: str, csv_path: str) -> str:
    """json-lines reviews → csv (reference auto-download+convert path,
    ``amazon_fashion.py:214-255``; the download itself needs egress)."""
    import json

    rows = []
    with open(json_path) as f:
        for line in f:
            r = json.loads(line)
            rows.append({
                "overall": r.get("overall", 0.0),
                "verified": r.get("verified", False),
                "reviewerID": r.get("reviewerID", ""),
                "asin": r.get("asin", ""),
                "reviewText": r.get("reviewText", ""),
                "summary": r.get("summary", ""),
                "unixReviewTime": r.get("unixReviewTime", 0),
                "vote": float(str(r.get("vote", "0")).replace(",", "")),
            })
    pd.DataFrame(rows).to_csv(csv_path, index=False)
    return csv_path


def synthetic_amazon_fashion(path: str, num_rows: int = 600,
                             num_reviewers: int = 60, num_items: int = 30,
                             seed: int = 0) -> str:
    """Synthetic review fixture with a learnable text→rating signal."""
    rng = np.random.RandomState(seed)
    pos_words = ["great", "love", "perfect", "comfortable", "beautiful"]
    neg_words = ["terrible", "broke", "cheap", "awful", "returned"]
    neutral = ["shirt", "dress", "shoes", "fabric", "color", "size", "fit"]
    rows = []
    for _ in range(num_rows):
        rating = rng.randint(1, 6)
        lexicon = pos_words if rating >= 4 else (
            neg_words if rating <= 2 else neutral)
        words = list(rng.choice(lexicon, 4)) + list(rng.choice(neutral, 4))
        rng.shuffle(words)
        rows.append({
            "overall": float(rating),
            "verified": bool(rng.rand() < 0.8),
            "reviewerID": f"R{rng.randint(num_reviewers)}",
            "asin": f"B{rng.randint(num_items):05d}",
            "reviewText": " ".join(words),
            "summary": " ".join(words[:3]),
            "unixReviewTime": int(rng.randint(1500000000, 1600000000)),
            "vote": float(rng.randint(0, 50)),
        })
    pd.DataFrame(rows).to_csv(path, index=False)
    return path
