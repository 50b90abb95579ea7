"""Data pipeline (L2): datasets, loaders, augmentation.

Host-side numpy/cv2 counterpart of the reference's utils/datasets.py +
utils/augmentations.py, feeding fixed-shape device batches
(images NHWC uint8/float, targets (B, M, 5) padded).
"""
