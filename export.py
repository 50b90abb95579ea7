"""Export CLI (counterpart of reference export.py).

Formats (the TPU-native equivalents of the reference's export matrix,
export.py:50-251):

    saved_model : TF SavedModel via jax2tf (replaces models/tf.py's
                  hand-written Keras re-implementation — jax2tf converts
                  the real model, no re-port needed)
    pb          : frozen TF GraphDef
    tflite      : TFLite flatbuffer (+ --int8 with a representative
                  dataset for full integer quantization)
    stablehlo   : StableHLO MLIR text via jax.export (the portable IR)
    onnx        : ONNX protobuf via the torch mirror graph
                  (utils/torch_mirror.py) + torch's ONNX serializer —
                  reference counterpart export.py:64-130; covers the
                  yolov5-family graphs (mirrors exist for their blocks)
    tfjs        : TensorFlow.js graph-model dir (model.json + weight
                  shards). jax2tf's XlaCallModule graph is opaque to a
                  tfjs runtime, so this leg goes through the TF-ops
                  mirror (utils/tf_mirror.py — the counterpart of the
                  reference's models/tf.py re-port, parity-tested against
                  the flax model) and writes the tfjs wire format from
                  its frozen Const-bearing GraphDef — reference
                  counterpart export.py:246-263 (which shells out to the
                  absent tensorflowjs_converter)
    coreml      : CoreML .mlmodel NeuralNetwork protobuf, written
                  directly in wire format from the torch mirror with BN
                  folded (utils/coreml_export.py) — reference counterpart
                  export.py:130-161 (which needs the absent coremltools);
                  verified by an independent parser + EXECUTED torch
                  re-interpretation of the artifact bytes
                  (tests/test_coreml_export.py); yolov5-family graphs

Each export wraps forward + decode; NMS stays outside (like the
reference's default exports) unless --nms.
"""

from __future__ import annotations

import argparse
import time
from pathlib import Path

import numpy as np

from yolosomi_tpu.engine.runner import Runner
from yolosomi_tpu.utils.general import LOGGER


def _build_fn(runner: Runner, nms: bool, conf_thres: float, iou_thres: float):
    import jax

    from yolosomi_tpu.models.heads import decode
    from yolosomi_tpu.ops.nms import non_max_suppression

    variables = runner.variables

    def fn(images):
        preds = runner.model.apply(variables, images, train=False)
        dec = decode(preds, runner.meta.anchors_px, runner.meta.strides)
        if nms:
            return non_max_suppression(dec, conf_thres=conf_thres, iou_thres=iou_thres, max_det=300)
        return dec

    return fn


def export_saved_model(fn, imgsz: int, batch: int, out: Path, native: bool = False):
    import tensorflow as tf
    from jax.experimental import jax2tf

    # legacy (non-native) lowering emits plain TF ops so the SavedModel is
    # both TF-Serving- and TFLite-convertible; native serialization wraps
    # everything in XlaCallModule, which the TFLite converter rejects
    tf_fn = tf.function(
        jax2tf.convert(fn, with_gradient=False, native_serialization=native),
        input_signature=[tf.TensorSpec([batch, imgsz, imgsz, 3], tf.float32)],
        autograph=False,
    )
    module = tf.Module()
    module.f = tf_fn
    tf.saved_model.save(module, str(out))
    LOGGER.info(f"SavedModel: {out}")
    return out


def export_pb(saved_model_dir: Path, out: Path):
    import tensorflow as tf
    from tensorflow.python.framework.convert_to_constants import convert_variables_to_constants_v2

    model = tf.saved_model.load(str(saved_model_dir))
    frozen = convert_variables_to_constants_v2(model.f.get_concrete_function())
    tf.io.write_graph(frozen.graph.as_graph_def(), str(out.parent), out.name, as_text=False)
    LOGGER.info(f"GraphDef: {out}")
    return out


def export_tflite(saved_model_dir: Path, out: Path, int8: bool = False, rep_data=None,
                  ops: str = "builtins"):
    """ops="builtins_only": pure TFLite builtins — only possible from the
    TF-ops mirror SavedModel (utils/tf_mirror.py); executes with no flex
    delegate at ~3e-7 rel box error (the preferred artifact).
    ops="builtins": legalize to TFLite builtins + SELECT_TF_OPS (flex) —
    works from the jax2tf SavedModel too, executable by the bundled
    interpreter (parity within TFLite's transcendental-approximation
    error, ~0.13% rel on boxes).
    ops="stablehlo": carry StableHLO ops directly — smaller/portable but
    needs a LiteRT runtime newer than this image's tf 2.21 interpreter.
    (Reference counterpart: export.py:182-214.)"""
    import tensorflow as tf

    converter = tf.lite.TFLiteConverter.from_saved_model(str(saved_model_dir))
    if ops == "stablehlo":
        converter.target_spec.supported_ops = [tf.lite.OpsSet.EXPERIMENTAL_STABLEHLO_OPS]
    elif ops == "builtins_only":
        converter.target_spec.supported_ops = [tf.lite.OpsSet.TFLITE_BUILTINS]
    else:
        converter.target_spec.supported_ops = [
            tf.lite.OpsSet.TFLITE_BUILTINS, tf.lite.OpsSet.SELECT_TF_OPS,
        ]
    if int8:
        converter.optimizations = [tf.lite.Optimize.DEFAULT]
        if rep_data is not None:
            converter.representative_dataset = rep_data
    blob = converter.convert()
    out.write_bytes(blob)
    LOGGER.info(f"TFLite: {out} ({len(blob) / 1e6:.1f} MB)")
    return out


def export_stablehlo(fn, imgsz: int, batch: int, out: Path):
    import jax
    from jax import export as jexport

    exported = jexport.export(jax.jit(fn))(
        jax.ShapeDtypeStruct((batch, imgsz, imgsz, 3), np.float32)
    )
    out.write_text(exported.mlir_module())
    LOGGER.info(f"StableHLO: {out}")
    return out


def representative_dataset_gen(source: str, imgsz: int, n: int = 100):
    """Int8 calibration feed (reference: export.py representative_dataset_gen)."""
    import cv2

    from yolosomi_tpu.data.augment import letterbox

    files = sorted(Path(source).glob("*.*"))[:n]

    def gen():
        for f in files:
            im = cv2.imread(str(f))
            if im is None:
                continue
            im = letterbox(im, imgsz, auto=False)[0]
            yield [im[None].astype(np.float32) / 255.0]

    return gen


def run(
    weights=None,
    cfg="yolo-somi",
    imgsz=640,
    batch_size=1,
    include=("saved_model", "tflite", "stablehlo"),
    nms=False,
    conf_thres=0.25,
    iou_thres=0.45,
    int8=False,
    data=None,
    opset=12,
    dynamic=False,
    project="runs/export",
    name="exp",
):
    from yolosomi_tpu.utils.general import increment_path

    t0 = time.time()
    save_dir = increment_path(Path(project) / name, mkdir=True)
    runner = Runner(cfg, weights, imgsz=imgsz)
    fn = _build_fn(runner, nms, conf_thres, iou_thres)

    outputs = []
    if "torchscript" in include:
        from yolosomi_tpu.utils.onnx_export import export_torchscript

        out = save_dir / "model.torchscript"
        try:
            export_torchscript(
                runner.meta.yaml, runner.meta, runner.variables, str(out),
                imgsz=imgsz, batch=batch_size,
            )
            LOGGER.info(f"TorchScript: {out} ({out.stat().st_size / 1e6:.1f} MB)")
            outputs.append(out)
        except NotImplementedError as e:
            LOGGER.warning(f"TorchScript: skipped — {e}")
    if "onnx" in include:
        from yolosomi_tpu.utils.onnx_export import export_onnx, onnx_summary

        out = save_dir / "model.onnx"
        try:
            export_onnx(
                runner.meta.yaml, runner.meta, runner.variables, str(out),
                imgsz=imgsz, batch=batch_size, opset=opset, dynamic_batch=dynamic,
            )
            s = onnx_summary(str(out))
            LOGGER.info(
                f"ONNX: {out} (opset {s['opset']}, {s['n_nodes']} nodes, "
                f"{s['n_initializers']} initializers, ops {sorted(s['ops'])})"
            )
            outputs.append(out)
        except NotImplementedError as e:
            LOGGER.warning(f"ONNX: skipped — {e}")
    if "coreml" in include:
        from yolosomi_tpu.utils.coreml_export import coreml_summary, export_coreml

        out = save_dir / "model.mlmodel"
        try:
            export_coreml(
                runner.meta.yaml, runner.meta, runner.variables, str(out), imgsz=imgsz
            )
            s = coreml_summary(str(out))
            LOGGER.info(
                f"CoreML: {out} (spec v{s['spec_version']}, {s['n_layers']} layers, "
                f"ops {sorted(s['ops'])}, outputs {s['outputs']})"
            )
            outputs.append(out)
        except NotImplementedError as e:
            LOGGER.warning(f"CoreML: skipped — {e}")
    if "stablehlo" in include:
        outputs.append(export_stablehlo(fn, imgsz, batch_size, save_dir / "model.stablehlo.mlir"))
    sm_dir = None
    if {"saved_model", "pb", "tflite"} & set(include):
        sm_dir = export_saved_model(fn, imgsz, batch_size, save_dir / "saved_model")
        outputs.append(sm_dir)
    if "pb" in include and sm_dir:
        outputs.append(export_pb(sm_dir, save_dir / "model.pb"))
    sm_tf = None
    if {"tflite", "tfjs"} & set(include) and not nms:
        # plain-TF-ops mirror SavedModel: enables builtins-only TFLite and
        # TFJS; graphs with unmirrored blocks fall back to jax2tf+flex.
        # The mirror exports forward+decode only, so --nms artifacts take
        # the jax2tf path (which embeds the NMS) instead.
        from yolosomi_tpu.utils.tf_mirror import export_saved_model_tf

        try:
            sm_tf = export_saved_model_tf(
                runner.model, runner.meta, runner.variables, imgsz, batch_size,
                save_dir / "saved_model_tf",
            )
        except NotImplementedError as e:
            wanted = " and ".join(sorted({"tflite", "tfjs"} & set(include)))
            LOGGER.warning(
                f"TF mirror unavailable for this graph ({e}); {wanted} fall back to "
                "the jax2tf path (TFLite: flex ops; TFJS: not exportable — its "
                "runtime cannot execute XlaCallModule)"
            )
    if "tflite" in include and (sm_tf or sm_dir):
        rep = representative_dataset_gen(data, imgsz) if (int8 and data) else None
        if sm_tf is not None:
            outputs.append(export_tflite(sm_tf, save_dir / "model.tflite", int8=int8,
                                         rep_data=rep, ops="builtins_only"))
        else:
            outputs.append(export_tflite(sm_dir, save_dir / "model.tflite", int8=int8, rep_data=rep))
    if "tfjs" in include and sm_tf is None:
        LOGGER.warning(
            "TFJS: skipped — needs the TF-ops mirror graph"
            + (" (--nms is not supported in the tfjs artifact; re-run without --nms)" if nms else "")
        )
    if "tfjs" in include and sm_tf is not None:
        from yolosomi_tpu.utils.tfjs_export import export_tfjs

        outputs.append(export_tfjs(sm_tf, save_dir / "model_web"))
    LOGGER.info(f"export complete ({time.time() - t0:.1f}s): {[str(o) for o in outputs]}")
    return outputs


def parse_opt(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--weights", type=str, default=None)
    parser.add_argument("--cfg", type=str, default="yolo-somi")
    parser.add_argument("--imgsz", "--img", "--img-size", type=int, default=640)
    parser.add_argument("--batch-size", type=int, default=1)
    parser.add_argument("--include", nargs="+", default=["saved_model", "tflite", "stablehlo"])
    parser.add_argument("--nms", action="store_true", help="embed decode+NMS in the export")
    parser.add_argument("--conf-thres", type=float, default=0.25)
    parser.add_argument("--iou-thres", type=float, default=0.45)
    parser.add_argument("--int8", action="store_true")
    parser.add_argument("--data", type=str, default=None, help="images dir for int8 calibration")
    parser.add_argument("--opset", type=int, default=12, help="ONNX opset version")
    parser.add_argument("--dynamic", action="store_true", help="ONNX dynamic batch axis")
    parser.add_argument("--project", default="runs/export")
    parser.add_argument("--name", default="exp")
    parser.add_argument("--device", type=str, default="")
    return parser.parse_args(argv)


def main(opt):
    opts = vars(opt).copy()
    from yolosomi_tpu.utils.general import select_device

    select_device(opts.pop("device", ""))
    run(**opts)


if __name__ == "__main__":
    main(parse_opt())
