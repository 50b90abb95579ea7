"""Compute ops (L3): XLA/Pallas kernels for the hot paths.

TPU-native counterparts of the reference's native components
(SURVEY.md §2.9): torchvision NMS -> static-shape XLA suppression loop
(nms.py); DCNv3 CUDA extension -> jnp reference + Pallas kernel (dcn.py);
host augmentation -> on-device preprocess (preprocess.py).
"""
