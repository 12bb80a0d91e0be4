"""aimnet_x2d_tpu — a TPU-native molecular property-prediction framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of AIMNet-X2D
(reference: /root/reference, mahdi-shafiei/AIMNet-X2D):

- host-side SMILES featurization (native parser; RDKit backend optional),
  multi-hop BFS edges, stereochemistry, formal charges
- shell-convolution message passing as segment-sorted gather/scatter over
  padded/bucketed fixed-shape molecular batches (XLA + Pallas kernels)
- attention/mean/max/sum graph pooling, SAE target normalization, standard
  scaling, single/multi-task regression with L1/MSE/evidential losses
- data-parallel + graph-partitioned training over a jax.sharding.Mesh
- MC-dropout / evidential uncertainty, embedding extraction, streaming
  datasets, transfer learning, YAML hyperparameter search
"""

__version__ = "0.1.0"
