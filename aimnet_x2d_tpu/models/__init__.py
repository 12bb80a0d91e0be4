from .gnn import GNN, GNNConfig, GNNOutput
from .layers import Linear, LinearBlock, MultiLayerPerceptron, ShellConvolutionLayer
from .losses import create_loss_function
from .pooling import POOLING_TYPES

__all__ = [
    "GNN",
    "GNNConfig",
    "GNNOutput",
    "Linear",
    "LinearBlock",
    "MultiLayerPerceptron",
    "ShellConvolutionLayer",
    "create_loss_function",
    "POOLING_TYPES",
]
