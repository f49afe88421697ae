"""CLI entry point (ref main.py:1-72): absl flags + ml_collections configs,
logging teed to <workdir>/stdout.txt, train/eval dispatch.

Usage:
  python -m diffspectra_tpu.main --config diffspectra_tpu/configs/diffspectra_qm9s.py \
      --workdir exp/run1 --mode train \
      --config.data.spectra_version allspectra
"""

from __future__ import annotations

import logging
import os
import sys

from absl import app, flags
from ml_collections.config_flags import config_flags

FLAGS = flags.FLAGS

config_flags.DEFINE_config_file(
    "config", None, "Training configuration.", lock_config=True
)
config_flags.DEFINE_config_file(
    "config_original_qm9", None,
    "Auxiliary original-QM9 configuration (metrics reference mols).",
    lock_config=True,
)
flags.DEFINE_string("workdir", None, "Work directory.")
flags.DEFINE_enum(
    "mode", None, ["train", "eval", "pretrain"],
    "Running mode: train, eval, or pretrain (SpecFormer masked-patch "
    "self-supervision; TPU-native addition — the reference only consumes a "
    "pretrained checkpoint, ref dmt.py:268-303)",
)
flags.DEFINE_string("eval_folder", "eval", "The folder name for storing evaluation results")
# default True matches the reference surface (ref main.py:24); JAX PRNG
# streams are config.seed-derived regardless — this seeds the HOST rngs
# (numpy/python) used by data shuffling and draw permutations
flags.DEFINE_bool("deterministic", True, "Set random seed for reproducibility")
flags.mark_flags_as_required(["workdir", "config", "mode"])


def main(argv):
    from . import run_lib

    if FLAGS.deterministic:
        run_lib.set_random_seed(FLAGS.config)

    try:
        from rdkit import RDLogger

        RDLogger.DisableLog("rdApp.*")
    except ImportError:
        pass

    os.makedirs(FLAGS.workdir, exist_ok=True)
    if FLAGS.mode == "train":
        log_path = os.path.join(FLAGS.workdir, "stdout.txt")
    elif FLAGS.mode == "pretrain":
        log_path = os.path.join(FLAGS.workdir, "pretrain_stdout.txt")
    else:
        log_path = os.path.join(FLAGS.workdir, "eval_stdout.txt")

    handlers = [
        logging.StreamHandler(sys.stdout),
        logging.FileHandler(log_path),
    ]
    logging.basicConfig(
        handlers=handlers,
        level=logging.INFO,
        format="%(levelname)s - %(filename)s - %(asctime)s - %(message)s",
        force=True,
    )

    if FLAGS.mode == "train":
        run_lib.train(FLAGS.config, FLAGS.config_original_qm9, FLAGS.workdir)
    elif FLAGS.mode == "eval":
        run_lib.evaluate(
            FLAGS.config, FLAGS.config_original_qm9, FLAGS.workdir, FLAGS.eval_folder
        )
    elif FLAGS.mode == "pretrain":
        from .training.pretrain import pretrain_specformer

        pretrain_specformer(FLAGS.config, FLAGS.workdir)
    else:
        raise ValueError(f"Mode {FLAGS.mode} not recognized.")


if __name__ == "__main__":
    app.run(main)
