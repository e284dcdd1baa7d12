"""CLI: cache input representations (reference: ppgs/preprocess/__main__.py).

    python -m ppgs_tpu.preprocess --datasets commonvoice \
        --representations mel w2v2fb
"""

import argparse

from ppgs_tpu import config as config_mod
from ppgs_tpu.preprocess import core


def main():
    parser = argparse.ArgumentParser(
        description='Preprocess input representations')
    parser.add_argument('--datasets', nargs='+', default=None)
    parser.add_argument('--representations', nargs='+', default=None)
    parser.add_argument('--config', default=None)
    parser.add_argument('--partition', default=None)
    args = parser.parse_args()

    config = config_mod.use(args.config) if args.config else None
    core.datasets(args.datasets, args.representations, config,
                  args.partition)


if __name__ == '__main__':
    main()
