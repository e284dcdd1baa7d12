"""CLI: partition datasets (reference: ppgs/partition/__main__.py)."""

import argparse

from ppgs_tpu.partition import datasets


def main():
    parser = argparse.ArgumentParser(description='Partition datasets')
    parser.add_argument('--datasets', nargs='+', default=None)
    args = parser.parse_args()
    datasets(args.datasets)


if __name__ == '__main__':
    main()
