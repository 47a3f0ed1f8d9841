"""helm_tpu — TPU-native TFHE circuit evaluation (HELM-capable framework).

See DESIGN.md for architecture and SURVEY.md for the reference contract.
"""

__version__ = "0.1.0"
