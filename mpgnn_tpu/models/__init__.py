"""Neural models: relation-masked convolutions, metapath GNNs, and the
relation scorer. Functional modules with explicit parameter pytrees so they
compose with vmap/pjit over relation and candidate-metapath axes."""

from mpgnn_tpu.models.relconv import (
    RelConvParams,
    init_relconv,
    relconv_apply,
    fast_rgcn_aggregate,
)
from mpgnn_tpu.models.mpgnn import (
    MPGNNParams,
    init_mpgnn,
    mpgnn_forward,
    init_rgcn_net,
    rgcn_net_forward,
)
from mpgnn_tpu.models.scorer import (
    ScorerParams,
    init_scorer_params,
    scorer_forward_flat,
    scorer_forward_bags,
)

__all__ = [
    "RelConvParams",
    "init_relconv",
    "relconv_apply",
    "fast_rgcn_aggregate",
    "MPGNNParams",
    "init_mpgnn",
    "mpgnn_forward",
    "init_rgcn_net",
    "rgcn_net_forward",
    "ScorerParams",
    "init_scorer_params",
    "scorer_forward_flat",
    "scorer_forward_bags",
]
