"""Model layer (L4): module zoo, heads, YAML graph compiler.

TPU-native counterpart of the reference's models/ package
(/root/reference/models/common.py, models/yolo.py). All modules are
flax.linen, NHWC layout, functional apply.
"""

from yolosomi_tpu.models.yolo import DetectionModel, build_model, parse_model  # noqa: F401
