"""Tests for the plot module (image rendering + accuracy bars)."""

import json

import numpy as np
import pytest

import ppgs_tpu
from ppgs_tpu import plot
from ppgs_tpu.plot.core import CELL_HEIGHT, CELL_WIDTH, LABEL_WIDTH


def random_ppg(seed=0, frames=30):
    rng = np.random.default_rng(seed)
    logits = rng.standard_normal((40, frames)).astype(np.float32)
    exp = np.exp(logits - logits.max(axis=0, keepdims=True))
    return exp / exp.sum(axis=0, keepdims=True)


def test_ppg_to_image(tmp_path):
    ppg = random_ppg()
    image = plot.from_ppg_to_image(ppg)
    assert image.size == (LABEL_WIDTH + 30 * CELL_WIDTH, 40 * CELL_HEIGHT)
    out = tmp_path / 'ppg.png'
    plot.from_ppg_to_image_file(ppg, out)
    assert out.exists() and out.stat().st_size > 0


def test_ppg_image_with_second_ppg(tmp_path):
    ppg, second = random_ppg(0), random_ppg(1)
    out = tmp_path / 'cmp.png'
    plot.from_ppg_to_image_file(ppg, out, second_ppg=second)
    assert out.exists()


def test_ppg_image_with_textgrid(tmp_path):
    from ppgs_tpu.data import textgrid

    ppg = random_ppg(frames=20)
    phones = [textgrid.Phoneme('aa', 0.0, 0.1),
              textgrid.Phoneme('iy', 0.1, 0.2)]
    alignment = textgrid.Alignment([textgrid.Word('x', phones)])
    tg = tmp_path / 'a.TextGrid'
    alignment.save(tg)
    out = tmp_path / 'overlay.png'
    plot.from_ppg_to_image_file(ppg, out, textgrid_file=tg)
    assert out.exists()


def test_ppg_to_video(tmp_path):
    cv2 = pytest.importorskip('cv2')

    frames = 120
    ppg = random_ppg(frames=frames)
    out = tmp_path / 'ppg.mp4'
    plot.from_ppg_to_video_file(ppg, None, out)
    assert out.exists() and out.stat().st_size > 0

    cap = cv2.VideoCapture(str(out))
    # Real-time playback: hop 2 PPG frames per video frame at 50 fps
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == frames // 2
    assert int(round(cap.get(cv2.CAP_PROP_FPS))) == 50
    # 40 phoneme rows + 10px bar, 100-frame window, x16 scale
    assert int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT)) == 50 * 16
    assert int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)) == 100 * 16
    # Playhead column is red-dominant in every row (BGR; mp4 chroma
    # subsampling desaturates the 1-px line, so test dominance not purity)
    ok, frame = cap.read()
    assert ok
    x = 100 * 16 // 2 - 16
    col = frame[:, x].astype(np.int32)
    assert (col[:, 2] >= 100).all()
    assert (col[:, 2] - col[:, 0] >= 60).all()
    cap.release()


def test_from_files_to_files_video(tmp_path):
    pytest.importorskip('cv2')
    ppg = random_ppg(frames=60)
    src = tmp_path / 'in.npy'
    np.save(src, ppg)
    out = tmp_path / 'out.mp4'
    plot.from_files_to_files([out], ppg_files=[src])
    assert out.exists() and out.stat().st_size > 0


def test_from_files_to_files(tmp_path):
    ppg = random_ppg()
    src = tmp_path / 'in.npy'
    np.save(src, ppg)
    out = tmp_path / 'out.jpg'
    plot.from_files_to_files([out], ppg_files=[src])
    assert out.exists()


def test_accuracy_plot(tmp_path, monkeypatch):
    from ppgs_tpu import config as config_mod

    eval_dir = tmp_path / 'eval'
    monkeypatch.setattr(config_mod, 'EVAL_DIR', eval_dir)
    rng = np.random.default_rng(0)
    for rep in ['mel', 'w2v2fb']:
        (eval_dir / rep).mkdir(parents=True)
        for ds in ['timit', 'arctic']:
            with open(eval_dir / rep / f'{ds}.json', 'w') as f:
                json.dump({'Accuracy': float(rng.uniform(0.4, 0.85))}, f)

    out = tmp_path / 'accuracy.png'
    plot.accuracy.from_eval(out, datasets=['timit', 'arctic'],
                            representations=['mel', 'w2v2fb'])
    assert out.exists() and out.stat().st_size > 0


def test_accuracy_plot_no_results(tmp_path, monkeypatch):
    from ppgs_tpu import config as config_mod

    monkeypatch.setattr(config_mod, 'EVAL_DIR', tmp_path / 'nothing')
    with pytest.raises(FileNotFoundError):
        plot.accuracy.from_eval(tmp_path / 'x.png')
