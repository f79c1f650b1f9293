"""Semantic column types (stypes).

TPU-native replacement for the forked pytorch-frame ``stype`` surface used by
the reference (see /root/reference SURVEY: ``torch_frame.stype`` usage at
``src/datasets/ibm_transactions_for_aml.py:242-247``, fork-only stypes
``relation`` (``src/datasets/util/graph.py:64``) and ``mask``
(``src/datasets/ibm_transactions_for_aml.py:276``), text stypes at
``downstream_model_LLM.py:70,78``).

An :class:`Stype` is an ``IntEnum`` so it can key sorted pytree dicts (JAX
flattens dict pytrees in sorted key order — the enum value order therefore
defines the canonical stype ordering of column blocks inside a
:class:`~rmm_tpu.frame.tensor_frame.TensorFrame`).
"""
from __future__ import annotations

import enum


class Stype(enum.IntEnum):
    """Semantic type of a column.

    The integer values define the canonical ordering used when concatenating
    per-stype column blocks into the ``[batch, num_cols, channels]`` encoding.
    """

    numerical = 0
    categorical = 1
    multicategorical = 2
    timestamp = 3
    text_embedded = 4
    text_tokenized = 5
    embedding = 6
    relation = 7   # fork-only: raw relation/id columns (link targets, node ids)
    mask = 8       # fork-only: packed mask target [masked_value, masked_col_idx]

    @property
    def is_text_stype(self) -> bool:
        return self in (Stype.text_embedded, Stype.text_tokenized)

    @property
    def uses_stats(self) -> bool:
        return self in (Stype.numerical, Stype.categorical, Stype.timestamp)

    def __str__(self) -> str:  # 'numerical' not 'Stype.numerical'
        return self.name


# Module-level aliases mirroring the reference import style
# (``torch_frame.numerical`` etc.).
numerical = Stype.numerical
categorical = Stype.categorical
multicategorical = Stype.multicategorical
timestamp = Stype.timestamp
text_embedded = Stype.text_embedded
text_tokenized = Stype.text_tokenized
embedding = Stype.embedding
relation = Stype.relation
mask = Stype.mask

#: Canonical iteration order for stype blocks in a TensorFrame.
STYPE_ORDER = tuple(Stype)
