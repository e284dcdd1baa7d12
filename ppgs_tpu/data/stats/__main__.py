"""CLI: dataset statistics (reference: ppgs/data/stats/__main__.py)."""

import argparse

from ppgs_tpu.data.stats import process


def main():
    parser = argparse.ArgumentParser(description='Dataset statistics')
    parser.add_argument('--datasets', nargs='+', default=None)
    args = parser.parse_args()
    process(args.datasets)


if __name__ == '__main__':
    main()
