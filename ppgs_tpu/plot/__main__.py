"""CLI: plot PPGs (reference: ppgs/plot/__main__.py)."""

import argparse

from ppgs_tpu import plot


def main():
    parser = argparse.ArgumentParser(description='Plot PPGs')
    parser.add_argument('--output_paths', nargs='+', required=True)
    parser.add_argument('--ppg_paths', nargs='+', default=None)
    parser.add_argument('--audio_paths', nargs='+', default=None)
    parser.add_argument('--second_ppg_paths', nargs='+', default=None)
    parser.add_argument('--textgrid_paths', nargs='+', default=None)
    parser.add_argument('--checkpoint', default=None)
    args = parser.parse_args()
    plot.from_files_to_files(
        args.output_paths,
        ppg_files=args.ppg_paths,
        audio_files=args.audio_paths,
        second_ppg_files=args.second_ppg_paths,
        textgrid_files=args.textgrid_paths,
        checkpoint=args.checkpoint)


if __name__ == '__main__':
    main()
