"""CLI: accuracy bar chart (reference: ppgs/plot/accuracy/__main__.py)."""

import argparse

from ppgs_tpu.plot.accuracy import from_eval


def main():
    parser = argparse.ArgumentParser(description='Plot accuracy bars')
    parser.add_argument('--output_file', required=True)
    parser.add_argument('--datasets', nargs='+', default=None)
    parser.add_argument('--representations', nargs='+', default=None)
    args = parser.parse_args()
    from_eval(args.output_file, args.datasets, args.representations)


if __name__ == '__main__':
    main()
