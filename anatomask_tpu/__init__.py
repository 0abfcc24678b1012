"""anatomask_tpu — TPU-native 3D medical segmentation + masked-image-modeling framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of ricklisz/AnatoMask
(an nnU-Net v2 fork with SparK-style sparse masked-conv pretraining and
teacher-guided easy-to-hard masking). See SURVEY.md at the repo root for the
capability inventory this framework implements.
"""

__version__ = "0.1.0"
