"""Scriptable dataset EDA — the reference's data notebooks
(``data/*.ipynb``, SURVEY §2 item 38) as reproducible CLI reports.

Two modes:

* ``--data <path>`` (no ``--family``): generic JSON summary of any
  dataset the dispatcher recognizes (row/node/edge counts, split sizes,
  per-column stype + stats, degree distribution, label balance).
* ``--family <name> --report``: the family's NOTEBOOK-parity analyses as
  a markdown report under ``--out`` (default ``outputs/eda/``). Runs on
  ``--data`` when given, else on the family's synthetic fixture — the
  same analyses apply to the real download unchanged. Families:
  aml (AML.ipynb), amazon (amazon-review-v2.ipynb),
  elliptic (elliptic_bitcoin_dataset.ipynb),
  eth (eth_phishing_transactions.ipynb), ogbn_arxiv (ogbn-arxiv.ipynb +
  ogbn-review.ipynb degree analysis), musae/lastfm (snap.ipynb),
  hm (rel-hm.ipynb).

Usage:
    python tools/eda.py --data <csv-or-dir>              # generic JSON
    python tools/eda.py --family aml --report            # notebook parity
    for f in aml amazon elliptic eth ogbn_arxiv musae lastfm hm; do
        python tools/eda.py --family $f --report; done   # regenerate all
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def summarize(dataset) -> dict:
    from rmm_tpu.frame.stats import StatType

    edges = dataset.edges
    nodes = dataset.nodes
    out = {
        "edges": edges.tensor_frame.num_rows,
        "nodes": nodes.tensor_frame.num_rows,
        "graph_nodes": dataset.graph.num_nodes,
        "graph_edges": dataset.graph.num_edges,
    }
    if edges.split_col and "split" in edges.df.columns:
        split = edges.df["split"].to_numpy()
        out["splits"] = {f"split_{i}": int((split == i).sum())
                         for i in range(3)}
    cols = {}
    for col, stats in edges.col_stats.items():
        entry = {"stype": str(edges.col_to_stype[col])}
        if StatType.MEAN in stats:
            entry["mean"] = round(stats[StatType.MEAN], 4)
            entry["std"] = round(stats[StatType.STD], 4)
        if StatType.COUNT in stats:
            entry["cardinality"] = len(stats[StatType.COUNT][0])
            entry["top"] = stats[StatType.COUNT][0][:3]
        cols[col] = entry
    out["edge_columns"] = cols
    deg = dataset.graph.train_sampler.in_degrees()
    out["in_degree"] = {
        "mean": float(deg.mean()), "max": int(deg.max(initial=0)),
        "p50": float(np.median(deg)),
        "isolated": int((deg == 0).sum()),
    }
    if edges.tensor_frame.y is not None:
        y = np.asarray(edges.tensor_frame.y)
        if y.shape[1] >= 1:
            labels, counts = np.unique(y[:, 0].astype(int),
                                       return_counts=True)
            if len(labels) <= 50:
                out["label_balance"] = {int(l): int(c)
                                        for l, c in zip(labels, counts)}
    return out


# ---------------------------------------------------------------------------
# markdown report helpers
# ---------------------------------------------------------------------------

def _hist_md(values, bins: int = 10, title: str = "") -> list[str]:
    """Text histogram (the notebooks' plt.hist, render-free)."""
    v = np.asarray(values, dtype=np.float64)
    v = v[np.isfinite(v)]
    if v.size == 0:
        return [f"*{title}: no finite values*", ""]
    edges = np.histogram_bin_edges(v, bins=bins)
    counts, _ = np.histogram(v, bins=edges)
    peak = max(int(counts.max()), 1)
    out = [f"**{title}** (n={v.size}, min={v.min():.4g}, "
           f"p50={np.median(v):.4g}, max={v.max():.4g})", "", "```"]
    for i, c in enumerate(counts):
        bar = "#" * max(1 if c else 0, round(40 * c / peak))
        out.append(f"[{edges[i]:>10.4g}, {edges[i + 1]:>10.4g}) "
                   f"{c:>7d} {bar}")
    out += ["```", ""]
    return out


def _vc_md(series: pd.Series, title: str, top: int = 12) -> list[str]:
    vc = series.value_counts()
    out = [f"**{title}** ({series.nunique()} distinct)", "",
           "| value | count | share |", "|---|---|---|"]
    for val, cnt in vc.head(top).items():
        out.append(f"| {val} | {cnt} | {cnt / len(series):.3f} |")
    if len(vc) > top:
        out.append(f"| … ({len(vc) - top} more) | | |")
    out.append("")
    return out


def _missing_md(df: pd.DataFrame) -> list[str]:
    na = df.isna().sum()
    out = ["**Missing values per column**", "",
           "| column | missing | % |", "|---|---|---|"]
    for col in df.columns:
        out.append(f"| {col} | {int(na[col])} | "
                   f"{100 * na[col] / len(df):.2f} |")
    out.append("")
    return out


def _schema_md(df: pd.DataFrame) -> list[str]:
    out = ["**Schema**", "", "| column | dtype | distinct |", "|---|---|---|"]
    for col in df.columns:
        out.append(f"| {col} | {df[col].dtype} | {df[col].nunique()} |")
    out.append("")
    return out


def _degree_md(src, dst, n_nodes: int) -> list[str]:
    """ogbn-review.ipynb's node-degree analysis (value_counts + hist)."""
    deg = np.bincount(np.concatenate([np.asarray(src), np.asarray(dst)]),
                      minlength=n_nodes)
    out = [f"**Degree analysis** — mean {deg.mean():.2f}, median "
           f"{np.median(deg):.0f}, max {deg.max()}, isolated "
           f"{(deg == 0).sum()}", ""]
    out += _hist_md(deg, bins=10, title="degree histogram")
    return out


# ---------------------------------------------------------------------------
# per-family notebook-parity reports
# ---------------------------------------------------------------------------

def report_aml(data: str | None, tmp: str) -> list[str]:
    """AML.ipynb: amount histogram, accounts-with-multiple-banks audit,
    label balance, then dataset materialization + split + loader peek."""
    from rmm_tpu.datasets import IBMTransactionsAML
    from rmm_tpu.datasets.synthetic import write_synthetic_aml_csv

    csv = data or write_synthetic_aml_csv(
        os.path.join(tmp, "aml.csv"), num_rows=4000, num_accounts=400,
        seed=0)
    df = pd.read_csv(csv)
    md = ["# IBM AML transactions — EDA",
          f"(`{csv}`; reference notebook `data/AML.ipynb`)", ""]
    md += _schema_md(df)
    md += _hist_md(df["Amount Received"], title="Amount Received")
    # accounts that appear under multiple banks (AML.ipynb's dedup audit)
    acct_banks = pd.concat([
        df[["From ID", "From Bank"]].rename(
            columns={"From ID": "acct", "From Bank": "bank"}),
        df[["To ID", "To Bank"]].rename(
            columns={"To ID": "acct", "To Bank": "bank"})])
    multi = acct_banks.groupby("acct")["bank"].nunique()
    md += [f"**Accounts under multiple banks**: "
           f"{int((multi > 1).sum())} of {len(multi)} "
           f"(the prepare step's bank+account global IDs make these "
           f"distinct nodes)", ""]
    md += _vc_md(df["Is Laundering"], "Is Laundering (label balance)")
    md += _vc_md(df["Payment Format"], "Payment Format")
    ds = IBMTransactionsAML(root=csv, khop_neighbors=(4, 4), channels=16)
    md += ["## Materialized dataset", "", "```json",
           json.dumps(summarize(ds), indent=1, default=str), "```", ""]
    return md


def report_amazon(data: str | None, tmp: str) -> list[str]:
    """amazon-review-v2.ipynb: reviews per reviewer/product, bipartite
    graph shape, missing values."""
    from rmm_tpu.datasets.amazon_fashion import synthetic_amazon_fashion

    csv = data or synthetic_amazon_fashion(
        os.path.join(tmp, "reviews.csv"), num_rows=4000, seed=0)
    df = pd.read_csv(csv)
    md = ["# Amazon Fashion reviews — EDA",
          f"(`{csv}`; reference notebook `data/amazon-review-v2.ipynb`)",
          ""]
    md += _schema_md(df)
    # the raw AMAZON_FASHION.json schema: reviewerID → asin review edges
    rev = df["reviewerID"].value_counts()
    prod = df["asin"].value_counts()
    md += _hist_md(rev.to_numpy(), title="reviews per reviewer")
    md += _hist_md(prod.to_numpy(), title="reviews per product")
    md += [f"**Bipartite graph**: {df['reviewerID'].nunique()} reviewers "
           f"+ {df['asin'].nunique()} products, {len(df)} review edges "
           "(converted to contiguous From ID/To ID at materialization)",
           ""]
    md += _vc_md(df["overall"], "rating distribution (the regression "
                                "target)")
    md += _missing_md(df)
    return md


def report_elliptic(data: str | None, tmp: str) -> list[str]:
    """elliptic_bitcoin_dataset.ipynb: class value_counts (incl the
    unknown class), id remapping audit, edge endpoint coverage."""
    from rmm_tpu.datasets.synthetic import write_synthetic_node_dataset

    root = data or write_synthetic_node_dataset(
        os.path.join(tmp, "elliptic"), family="elliptic", num_nodes=800,
        num_edges=2400, seed=0)
    nodes = pd.read_csv(os.path.join(root, "nodes.csv"))
    edges = pd.read_csv(os.path.join(root, "edges.csv"))
    md = ["# Elliptic bitcoin — EDA",
          f"(`{root}`; reference notebook "
          "`data/elliptic_bitcoin_dataset.ipynb`)", ""]
    md += _vc_md(nodes["class"], "class (1=illicit, 2=licit, unknown)")
    ids = nodes["txId"]
    md += [f"**txId remap audit**: {ids.nunique()} unique of {len(ids)}; "
           f"contiguous-from-0: {bool((np.sort(ids) == np.arange(len(ids))).all())} "
           "(the loader renumbers to 0-indexed contiguous)", ""]
    covered = (edges["txId1"].isin(set(ids)) &
               edges["txId2"].isin(set(ids))).mean()
    md += [f"**Edge endpoint coverage**: {covered:.4f} of edges have both "
           "endpoints in the node table", ""]
    md += _degree_md(edges["txId1"].map({t: i for i, t in enumerate(ids)}),
                     edges["txId2"].map({t: i for i, t in enumerate(ids)}),
                     len(ids))
    return md


def report_eth(data: str | None, tmp: str) -> list[str]:
    """eth_phishing_transactions.ipynb: node/edge counts, phishing label
    balance, time range, first-transaction cutoffs, edge-feature stats."""
    from rmm_tpu.datasets.synthetic import write_synthetic_node_dataset

    root = data or write_synthetic_node_dataset(
        os.path.join(tmp, "ethereum-phishing"), family="eth",
        num_nodes=800, num_edges=2400, seed=0)
    nodes = pd.read_csv(os.path.join(root, "nodes.csv"))
    edges = pd.read_csv(os.path.join(root, "edges.csv"))
    md = ["# Ethereum phishing — EDA",
          f"(`{root}`; reference notebook "
          "`data/eth_phishing_transactions.ipynb`)", ""]
    md += [f"**Graph**: {len(nodes)} nodes, {len(edges)} transactions; "
           f"block_timestamp range [{edges['block_timestamp'].min()}, "
           f"{edges['block_timestamp'].max()}]", ""]
    md += _vc_md(nodes["label"], "phishing label balance")
    cut = nodes["first_transaction"]
    md += _hist_md(cut, title="first_transaction cutoffs (temporal split "
                              "boundaries)")
    for col in ("value", "gas", "gas_price", "nonce"):
        md += _hist_md(np.log1p(edges[col]), title=f"log1p({col})")
    md += _degree_md(edges["from_address"], edges["to_address"], len(nodes))
    return md


def report_ogbn_arxiv(data: str | None, tmp: str) -> list[str]:
    """ogbn-arxiv.ipynb + ogbn-review.ipynb: node-feature describe, edge
    id bounds, label/year distributions, degree analysis."""
    from rmm_tpu.datasets.synthetic import write_synthetic_node_dataset

    root = data or write_synthetic_node_dataset(
        os.path.join(tmp, "ogbn_arxiv"), family="ogbn", num_nodes=800,
        num_edges=2400, n_classes=8, seed=0)
    nodes = pd.read_csv(os.path.join(root, "nodes.csv"))
    edges = pd.read_csv(os.path.join(root, "edges.csv"))
    md = ["# OGBN-arxiv — EDA",
          f"(`{root}`; reference notebooks `data/ogbn-arxiv.ipynb`, "
          "`data/ogbn-review.ipynb`)", ""]
    feat_cols = [c for c in nodes.columns
                 if c not in ("id", "label", "year")]
    desc = nodes[feat_cols].describe().round(4)
    md += ["**Node features describe()**", "", "```",
           desc.to_string(), "```", ""]
    md += [f"**Edge id bounds**: max src {edges['src'].max()}, max dst "
           f"{edges['dst'].max()}, nodes {len(nodes)} (ids must stay "
           "in-range)", ""]
    md += _vc_md(nodes["label"], "label distribution (40 classes in the "
                                 "real set)")
    md += _vc_md(nodes["year"], "year distribution (temporal split key)")
    md += _degree_md(edges["src"], edges["dst"], len(nodes))
    return md


def _report_snap(family: str, data: str | None, tmp: str,
                 target_col: str) -> list[str]:
    from rmm_tpu.datasets.synthetic import write_synthetic_node_dataset

    root = data or write_synthetic_node_dataset(
        os.path.join(tmp, family), family=family, num_nodes=800,
        num_edges=2400, n_classes=(2 if family == "musae" else 8), seed=0)
    nodes = pd.read_csv(os.path.join(root, "nodes.csv"))
    edges = pd.read_csv(os.path.join(root, "edges.csv"))
    md = [f"# {family} — EDA",
          f"(`{root}`; reference notebook `data/snap.ipynb`)", ""]
    feat_cols = [c for c in nodes.columns
                 if c.startswith("f") and c != "first_transaction"]
    md += [f"**Features**: {len(feat_cols)} columns (the raw snap JSON is "
           "ragged per-node feature LISTS, padded with −1 to fixed "
           "length at conversion — snap.ipynb)", ""]
    nnz = (nodes[feat_cols].to_numpy() != -1).sum(axis=1)
    md += _hist_md(nnz, title="non-padding features per node")
    md += _vc_md(nodes[target_col], f"{target_col} distribution")
    md += _degree_md(edges[edges.columns[0]], edges[edges.columns[1]],
                     len(nodes))
    return md


def report_musae(data, tmp):
    return _report_snap("musae", data, tmp, "ml_target")


def report_lastfm(data, tmp):
    return _report_snap("lastfm", data, tmp, "target")


def report_hm(data: str | None, tmp: str) -> list[str]:
    """rel-hm.ipynb: per-logical-table column counts, unique values,
    missing values, t_dat stats, article→product-name consistency."""
    from rmm_tpu.datasets.synthetic import write_synthetic_hm_csv

    csv = data or write_synthetic_hm_csv(
        os.path.join(tmp, "hm.csv"), num_rows=4000, seed=0)
    df = pd.read_csv(csv)
    md = ["# Rel-H&M — EDA",
          f"(`{csv}`; reference notebook `data/rel-hm.ipynb`)", ""]
    md += _schema_md(df)
    md += [f"**IDs**: {df['customer_id'].nunique()} customers, "
           f"{df['article_id'].nunique()} articles, {len(df)} "
           "transactions; customer/article id ranges overlap: "
           f"{len(set(df['customer_id']) & set(df['article_id']))} "
           "(renumbered disjoint at conversion — rel-hm.ipynb)", ""]
    md += ["**t_dat (unix seconds) describe()**", "", "```",
           df["t_dat"].describe().round(1).to_string(), "```", ""]
    # does every article_id map to one product name? (rel-hm.ipynb)
    per_article = df.groupby("article_id")["product_type_name"].nunique()
    md += [f"**Article attribute consistency**: "
           f"{int((per_article == 1).sum())} of {len(per_article)} "
           "articles have a single product_type_name", ""]
    md += _missing_md(df)
    md += _hist_md(df["price"], title="price")
    return md


REPORTS = {
    "aml": report_aml, "amazon": report_amazon,
    "elliptic": report_elliptic, "eth": report_eth,
    "ogbn_arxiv": report_ogbn_arxiv, "musae": report_musae,
    "lastfm": report_lastfm, "hm": report_hm,
}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data", default=None)
    p.add_argument("--family", default=None, choices=sorted(REPORTS))
    p.add_argument("--report", action="store_true",
                   help="write outputs/eda/<family>.md instead of JSON")
    p.add_argument("--out", default="outputs/eda")
    p.add_argument("--num_neighs", nargs="+", type=int, default=[10, 10])
    args = p.parse_args(argv)

    if args.family:
        os.makedirs(args.out, exist_ok=True)
        tmp = os.path.join(args.out, "_fixtures")
        os.makedirs(tmp, exist_ok=True)
        md = REPORTS[args.family](args.data, tmp)
        path = os.path.join(args.out, f"{args.family}.md")
        with open(path, "w") as f:
            f.write("\n".join(md))
        print(f"wrote {path}")
        return path

    if not args.data:
        p.error("--data is required without --family")
    from rmm_tpu.datasets import build_dataset
    from rmm_tpu.utils.config import Config

    cfg = Config(data=args.data, num_neighs=tuple(args.num_neighs),
                 edge_capacity=1024, node_capacity=1024)
    dataset = build_dataset(cfg)
    print(json.dumps(summarize(dataset), indent=2, default=str))


if __name__ == "__main__":
    main()
