from .sign_models import (
    DenseSignModel,
    ConvSignModel,
    LatticeConvolution,
    KagomeSignNetwork,
    KagomeResidualNetwork,
    GraphConvolution,
    GraphSignModel,
    mish,
)
from .adjacency import KAGOME_12_ADJ, KAGOME_36_ADJ, kagome_adjacency
