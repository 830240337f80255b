"""Stage entry points (python -m h36x.cli.<stage>), replacing the
reference's per-script argparse mains + SLURM wrappers:

  ingest       <- src/datasets/read_human_36m.py + run_read_h36m.sh
  extract      <- src/preprocess_resnet_features.py + preprocess_h36m.sh
  train        <- src/train.py + train.sh
  results      <- src/results.py + results.sh
  debug_batch  <- src/teste.py + teste.sh
  show_batch   <- src/testing_dataloader.py
"""
