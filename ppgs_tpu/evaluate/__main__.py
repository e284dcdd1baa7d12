"""CLI: objective evaluation (reference: ppgs/evaluate/__main__.py).

    python -m ppgs_tpu.evaluate --config mel --datasets timit arctic
"""

import argparse

from ppgs_tpu import config as config_mod
from ppgs_tpu.evaluate import datasets


def main():
    parser = argparse.ArgumentParser(description='Evaluate a PPG model')
    parser.add_argument('--datasets', nargs='+', default=None)
    parser.add_argument('--checkpoint', default=None)
    parser.add_argument('--config', default=None)
    args = parser.parse_args()

    config = config_mod.use(args.config) if args.config else None
    results = datasets(args.datasets, args.checkpoint, config)
    for name, metrics in results.items():
        if 'Accuracy' in metrics:
            print(f'{name}: accuracy={metrics["Accuracy"]:.4f} '
                  f'JSD={metrics.get("JSD", float("nan")):.4f}')


if __name__ == '__main__':
    main()
