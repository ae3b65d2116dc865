"""xequinet-tpu: a TPU-native equivariant GNN framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of XequiNet
(reference studied at /root/reference; see SURVEY.md for the blueprint).
"""

__version__ = "0.1.0"
