"""CLI: train a model (reference: ppgs/train/__main__.py).

    python -m ppgs_tpu.train --config mel --dataset commonvoice
"""

import argparse
import shutil
from pathlib import Path

import ppgs_tpu
from ppgs_tpu import config as config_mod


def main():
    parser = argparse.ArgumentParser(description='Train a PPG model')
    parser.add_argument('--config', default=None,
                        help='Named config (mel, w2v2fb, ...)')
    parser.add_argument('--dataset', default=None)
    parser.add_argument('--directory', default=None,
                        help='Run directory (default runs/<config>)')
    parser.add_argument('--steps', type=int, default=None)
    args = parser.parse_args()

    config = config_mod.use(args.config) if args.config else \
        config_mod.default()
    dataset = args.dataset or config.training_dataset
    directory = Path(args.directory or config_mod.RUNS_DIR / config.config)
    directory.mkdir(parents=True, exist_ok=True)

    # Record config provenance in the run directory
    with open(directory / 'config.txt', 'w') as file:
        file.write(repr(config))

    from ppgs_tpu.train import train

    train(dataset, directory, config=config, max_steps=args.steps)


if __name__ == '__main__':
    main()
