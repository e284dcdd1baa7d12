"""CLI: download datasets (reference: ppgs/data/download/__main__.py)."""

import argparse

from ppgs_tpu.data.download import datasets


def main():
    parser = argparse.ArgumentParser(description='Download datasets')
    parser.add_argument('--datasets', nargs='+', default=None)
    parser.add_argument('--format-only', action='store_true')
    args = parser.parse_args()
    datasets(args.datasets, format_only=args.format_only)


if __name__ == '__main__':
    main()
