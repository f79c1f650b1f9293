"""Dataset families (reference ``src/datasets/``)."""
from .base import PretrainType, parse_pretrain_args  # noqa: F401
from .graph_dataset import EdgeTable, GraphTableDataset, NodeTable  # noqa: F401
from .ibm_aml import IBMTransactionsAML  # noqa: F401
from .synthetic import synthetic_aml_frame, write_synthetic_aml_csv  # noqa: F401


def build_dataset(cfg):
    """Dataset dispatch by path substring (reference ``main.py:218-267``)."""
    from .base import PretrainType

    pretrain = parse_pretrain_args(cfg.pretrain)
    if "mcm" in cfg.task and not pretrain:
        pretrain = {PretrainType.MASK, PretrainType.LINK_PRED}
    common = dict(
        khop_neighbors=tuple(cfg.num_neighs), ports=cfg.ports, ego=cfg.ego,
        channels=cfg.n_hidden, edge_capacity=cfg.edge_capacity,
        node_capacity=cfg.node_capacity,
    )
    data = cfg.data
    if "ethereum-phishing" in data:
        from .eth_phishing import EthereumPhishing
        return EthereumPhishing(root=data, pretrain=pretrain,
                                split_type="temporal_daily", **common)
    if "elliptic" in data:
        from .elliptic import EllipticBitcoin
        return EllipticBitcoin(root=data, **common)
    if "ogbn" in data:
        from .ogbn_arxiv import OgbnArxiv
        return OgbnArxiv(root=data, split_type="temporal", **common)
    if "musae" in data:
        from .musae_github import MusaeGitHub
        return MusaeGitHub(root=data, **common)
    if "lastfm" in data:
        from .lastfm_asia import LastFMAsia
        return LastFMAsia(root=data, **common)
    if "hm" in data and ("rel" in data or "h-and-m" in data):
        from .rel_hm import RelHM
        return RelHM(root=data, pretrain=pretrain, **common)
    # default: IBM AML transactions (any csv path)
    return IBMTransactionsAML(
        root=data, pretrain=pretrain, split_type=cfg.split_type,
        splits=tuple(cfg.splits), **common)
