"""Synthetic dataset generators — the dummy.csv-style fixtures the
reference leans on for smoke tests and profiling (``test/ibm.py:6``,
``benchmark.py:111``)."""
from __future__ import annotations

import numpy as np
import pandas as pd


def synthetic_aml_frame(num_rows: int = 2000, num_accounts: int = 300,
                        num_days: int = 10, fraud_rate: float = 0.1,
                        seed: int = 0, communities: int = 0,
                        intra_rate: float = 0.9) -> pd.DataFrame:
    """AML-shaped transactions with a planted fraud signal: laundering
    transactions skew to large amounts, a specific currency pair and a
    small ring of accounts, so models have structure to learn.

    ``communities > 0`` additionally plants a LINK-STRUCTURE signal for
    the SSL pretext tasks (VERDICT r4 next-step #3): accounts partition
    into communities, non-fraud transactions stay intra-community with
    probability ``intra_rate``, and each community prefers a currency —
    so a GNN can recover an endpoint's community from its transaction
    neighborhood and a link-prediction head can rank true (mostly
    intra-community) edges above uniformly-corrupted negatives (mostly
    cross-community).  Default 0 keeps the generator byte-identical to
    the previous behavior for a fixed seed."""
    rng = np.random.RandomState(seed)
    n = num_rows
    is_fraud = rng.rand(n) < fraud_rate
    ring = rng.choice(num_accounts, size=max(num_accounts // 20, 2),
                      replace=False)

    from_id = rng.randint(0, num_accounts, n)
    to_id = rng.randint(0, num_accounts, n)
    from_id[is_fraud] = rng.choice(ring, is_fraud.sum())
    to_id[is_fraud] = rng.choice(ring, is_fraud.sum())
    amount = np.where(is_fraud, rng.lognormal(6, 1, n), rng.lognormal(3, 1, n))
    currencies = np.array(["USD", "EUR", "GBP", "BTC"])
    pay_cur = currencies[rng.randint(0, 4, n)]
    recv_cur = None  # communities=0: drawn at frame build, in the
    # ORIGINAL rng-stream position (byte-identity for a fixed seed)
    if communities:
        recv_cur = currencies[rng.randint(0, 4, n)]
        comm = rng.randint(0, communities, num_accounts)
        members = [np.nonzero(comm == c)[0] for c in range(communities)]
        intra = (~is_fraud) & (rng.rand(n) < intra_rate)
        for i in np.nonzero(intra)[0]:
            m = members[comm[from_id[i]]]
            if len(m):
                to_id[i] = m[rng.randint(len(m))]
        # currency flavor: payment by the SOURCE community, receiving by
        # the DESTINATION community — both endpoints' neighborhoods carry
        # their community signature
        flavor = rng.rand(n) < 0.7
        pay_cur = np.where(flavor, currencies[comm[from_id] % 4], pay_cur)
        recv_cur = np.where(flavor, currencies[comm[to_id] % 4], recv_cur)
    pay_cur[is_fraud & (rng.rand(n) < 0.7)] = "BTC"
    formats = np.array(["Wire", "ACH", "Cheque", "Card", "Bitcoin"])
    fmt = formats[rng.randint(0, 5, n)]
    fmt[is_fraud & (rng.rand(n) < 0.6)] = "Bitcoin"

    return pd.DataFrame({
        "Timestamp": rng.randint(0, num_days * 86400, n).astype(np.int64),
        "From Bank": rng.randint(0, 10, n),
        "From ID": from_id.astype(np.float64),
        "To Bank": rng.randint(0, 10, n),
        "To ID": to_id.astype(np.float64),
        "Amount Received": amount,
        "Receiving Currency": (recv_cur if recv_cur is not None
                               else currencies[rng.randint(0, 4, n)]),
        "Amount Paid": amount,
        "Payment Currency": pay_cur,
        "Payment Format": fmt,
        "Is Laundering": is_fraud.astype(int).astype(str),
    })


def write_synthetic_aml_csv(path: str, **kw) -> str:
    synthetic_aml_frame(**kw).to_csv(path, index=False)
    return path


def _planted_edges(rng, n_nodes, n_edges, labels):
    """Edges with homophily so node labels are learnable from structure."""
    src = rng.randint(0, n_nodes, n_edges)
    dst = rng.randint(0, n_nodes, n_edges)
    same = rng.rand(n_edges) < 0.7
    for i in np.nonzero(same)[0]:
        cands = np.nonzero(labels == labels[src[i]])[0]
        dst[i] = cands[rng.randint(len(cands))]
    return src, dst


def write_synthetic_node_dataset(root: str, family: str = "ogbn",
                                 num_nodes: int = 300, num_edges: int = 900,
                                 num_feats: int = 8, n_classes: int = 4,
                                 seed: int = 0) -> str:
    """nodes.csv/edges.csv fixtures matching each node-classification
    family's schema (elliptic / ogbn / musae / lastfm / eth)."""
    import os

    os.makedirs(root, exist_ok=True)
    rng = np.random.RandomState(seed)
    labels = rng.randint(0, n_classes, num_nodes)
    feats = rng.randn(num_nodes, num_feats) + labels[:, None] * 0.8
    src, dst = _planted_edges(rng, num_nodes, num_edges, labels)

    if family == "elliptic":
        # real Elliptic's first feature column ('1') is the TIME STEP the
        # temporal split sorts on (elliptic.py:46-49) — a label-independent
        # integer, NOT a signal feature; labels must stay balanced across
        # the time axis or the split manufactures class shift
        feats = feats.copy()
        feats[:, 0] = rng.randint(1, 50, num_nodes).astype(np.float32)
        nodes = pd.DataFrame(feats, columns=[str(i + 1)
                                             for i in range(num_feats)])
        nodes.insert(0, "txId", np.arange(num_nodes) * 7 + 3)  # non-contig
        cls = np.where(labels % 2 == 0, "1", "2").astype(object)
        cls[rng.rand(num_nodes) < 0.2] = "unknown"
        nodes.insert(1, "class", cls)
        edges = pd.DataFrame({"txId1": nodes["txId"].to_numpy()[src],
                              "txId2": nodes["txId"].to_numpy()[dst]})
    elif family == "musae":
        nodes = pd.DataFrame(feats, columns=[f"f{i}"
                                             for i in range(num_feats)])
        nodes["id"] = np.arange(num_nodes)
        nodes["name"] = [f"dev{i}" for i in range(num_nodes)]
        nodes["ml_target"] = labels % 2
        edges = pd.DataFrame({"id_1": src, "id_2": dst})
    elif family == "lastfm":
        nodes = pd.DataFrame(feats, columns=[f"f{i}"
                                             for i in range(num_feats)])
        nodes["id"] = np.arange(num_nodes)
        nodes["target"] = labels
        edges = pd.DataFrame({"node_1": src, "node_2": dst})
    elif family == "eth":
        nodes = pd.DataFrame({
            "node": np.arange(num_nodes),
            "label": (labels % 2).astype(int),
            "first_transaction": rng.randint(0, 30 * 86400, num_nodes),
        })
        edges = pd.DataFrame({
            "from_address": src, "to_address": dst,
            "nonce": rng.randint(0, 100, num_edges).astype(float),
            "value": rng.lognormal(0, 1, num_edges),
            "gas": rng.lognormal(1, 0.3, num_edges),
            "gas_price": rng.lognormal(2, 0.5, num_edges),
            "block_timestamp": rng.randint(0, 30 * 86400, num_edges),
        })
    else:  # ogbn-style
        nodes = pd.DataFrame(feats, columns=[f"f{i}"
                                             for i in range(num_feats)])
        nodes["id"] = np.arange(num_nodes)
        nodes["label"] = labels
        nodes["year"] = rng.randint(2010, 2020, num_nodes)
        edges = pd.DataFrame({"src": src, "dst": dst})
    nodes.to_csv(os.path.join(root, "nodes.csv"), index=False)
    edges.to_csv(os.path.join(root, "edges.csv"), index=False)
    return root


def write_synthetic_hm_csv(path: str, num_rows: int = 800,
                           num_customers: int = 80, num_articles: int = 40,
                           seed: int = 0) -> str:
    rng = np.random.RandomState(seed)
    n = num_rows
    cats = {
        "postal_code": [f"pc{i}" for i in range(10)],
        "product_type_name": ["Trousers", "Dress", "Sweater", "T-shirt"],
        "product_group_name": ["Garment Lower body", "Garment Upper body"],
        "graphical_appearance_name": ["Solid", "Stripe", "Print"],
        "colour_group_name": ["Black", "White", "Blue", "Red"],
        "perceived_colour_value_name": ["Dark", "Light", "Medium"],
        "perceived_colour_master_name": ["Black", "White", "Blue"],
        "department_name": ["Jersey", "Knitwear", "Trouser"],
        "index_name": ["Ladieswear", "Menswear", "Divided"],
        "index_group_name": ["Ladieswear", "Menswear"],
        "section_name": ["Womens Everyday", "Mens Basics"],
        "garment_group_name": ["Jersey Fancy", "Knitwear"],
    }
    df = pd.DataFrame({
        "t_dat": rng.randint(0, 20 * 86400, n).astype(np.int64),
        "customer_id": rng.randint(0, num_customers, n),
        "article_id": num_customers + rng.randint(0, num_articles, n),
        "price": rng.rand(n),
        **{k: rng.choice(v, n) for k, v in cats.items()},
    })
    df.to_csv(path, index=False)
    return path
