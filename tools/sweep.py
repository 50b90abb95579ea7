"""W&B sweep agent entry (reference: utils/loggers/wandb/sweep.py).

Launched by `wandb agent` with hyperparameters injected via wandb.config;
merges them over the CLI hyp tier and runs one training. Gated on the
wandb package (absent from this image — same gating as the reference's
optional W&B integration, loggers/__init__.py:33-156).

Usage: wandb sweep configs/sweep.yaml && wandb agent <sweep-id>
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def sweep():
    try:
        import wandb
    except ImportError:  # pragma: no cover
        raise SystemExit("tools/sweep.py requires the wandb package (pip install wandb)")

    from train import parse_opt, train
    from yolosomi_tpu.utils.config import load_hyp

    wandb.init()
    hyp_dict = dict(wandb.config)

    opt = parse_opt([])
    if "batch_size" in hyp_dict:
        opt.batch_size = int(hyp_dict.pop("batch_size"))
    if "epochs" in hyp_dict:
        opt.epochs = int(hyp_dict.pop("epochs"))
    if "data" in hyp_dict:
        opt.data = str(hyp_dict.pop("data"))
    opt.nosave = True

    hyp = load_hyp(opt.hyp)
    hyp.update({k: v for k, v in hyp_dict.items() if k in hyp})
    fitness = train(hyp, opt)
    wandb.log({"metrics/fitness": float(fitness)})


if __name__ == "__main__":
    sweep()
