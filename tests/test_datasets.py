"""Tests for the dataset acquisition layer: SPHERE conversion, phone-set
mapping with backfill, Needleman-Wunsch word alignment, TextGrid merging,
short-form TextGrid parsing."""

import struct

import numpy as np
import pytest

import ppgs_tpu
from ppgs_tpu.data.datasets import timit, words
from ppgs_tpu.data.download import align
from ppgs_tpu.data import textgrid
from ppgs_tpu.phonemes import SILENCE


###############################################################################
# TIMIT
###############################################################################


def make_sphere(path, samples, sample_rate=16000):
    """Create a synthetic NIST SPHERE file with int16 PCM."""
    pcm = samples.astype('<i2').tobytes()
    header_body = '\n'.join([
        f'sample_count -i {len(samples)}',
        'sample_n_bytes -i 2',
        'channel_count -i 1',
        f'sample_rate -i {sample_rate}',
        'sample_byte_format -s2 01',
        'end_head',
    ])
    header = b'NIST_1A\n   1024\n' + header_body.encode() + b'\n'
    header = header.ljust(1024, b' ')
    path.write_bytes(header + pcm)


def test_sphere_to_wav(tmp_path):
    rng = np.random.default_rng(0)
    samples = (rng.uniform(-0.4, 0.4, 1600) * 32767).astype(np.int16)
    sph = tmp_path / 'x.wav'
    make_sphere(sph, samples)

    wav_bytes = timit.sphere_to_wav(sph)
    out = tmp_path / 'out.wav'
    out.write_bytes(wav_bytes)

    from ppgs_tpu.data import audio as audio_io

    loaded, rate = audio_io.load_wav(out)
    assert rate == 16000
    np.testing.assert_allclose(
        loaded[0], samples.astype(np.float32) / 32768.0, atol=1e-6)


def test_ipa_to_cmu_basic():
    rows = [('0', '1600', 'h#'), ('1600', '3200', 'ax'),
            ('3200', '4800', 'q'), ('4800', '6400', 'h#')]
    result = timit.ipa_to_cmu(rows)
    ends, phones = zip(*result)
    assert phones == (SILENCE, 'ah', 't', SILENCE)
    assert ends == (0.1, 0.2, 0.3, 0.4)


def test_ipa_to_cmu_backfill_matching_release():
    # kcl followed by k -> closure merges into k
    rows = [('0', '1600', 'kcl'), ('1600', '3200', 'k'),
            ('3200', '4800', 'iy')]
    _, phones = zip(*timit.ipa_to_cmu(rows))
    assert phones == ('k', 'k', 'iy')


def test_ipa_to_cmu_backfill_fallback():
    # bcl NOT followed by b -> falls back to first candidate 'b'
    rows = [('0', '1600', 'bcl'), ('1600', '3200', 'iy')]
    _, phones = zip(*timit.ipa_to_cmu(rows))
    assert phones == ('b', 'iy')


def test_sphere_rejects_non_sphere(tmp_path):
    bad = tmp_path / 'bad.wav'
    bad.write_bytes(b'RIFFxxxxWAVE')
    with pytest.raises(ValueError):
        timit.sphere_to_wav(bad)


###############################################################################
# Needleman-Wunsch word alignment
###############################################################################


def test_needleman_wunsch_exact():
    out0, out1 = words.needleman_wunsch(list('abc'), list('abc'))
    assert out0 == list('abc')
    assert out1 == list('abc')


def test_align_one_to_many():
    mapping = {'cat': ['k', 'ae', 't'], 'sat': ['s', 'ae', 't']}
    phones = ['k', 'ae', 't', 's', 'ae', 't']
    groups = words.align_one_to_many(['cat', 'sat'], mapping, phones)
    assert groups == [['k', 'ae', 't'], ['s', 'ae', 't']]


def test_align_one_to_many_with_observation_noise():
    # Observed phones have one substitution; boundaries still recovered
    mapping = {'cat': ['k', 'ae', 't'], 'dog': ['d', 'ao', 'g']}
    phones = ['k', 'eh', 't', 'd', 'ao', 'g']
    splits = words.align_one_to_many(
        ['cat', 'dog'], mapping, phones, as_splits=True)
    assert splits == [0, 3, 6]


def test_from_sequence_data_word_intervals():
    phone_seq = ['pau', 'k', 'ae', 't', 'pau']
    phone_start = [0.0, 0.1, 0.2, 0.3, 0.4]
    phone_end = [0.1, 0.2, 0.3, 0.4, 0.5]

    # Monkeypatch dictionary lookup to avoid nltk dependency
    words.get_word_phones.lookup = {'cat': [['K', 'AE1', 'T']]}
    try:
        result = words.from_sequence_data(
            phone_seq, phone_start, phone_end, ['cat'])
    finally:
        del words.get_word_phones.lookup
    # silence, word, silence
    assert len(result) == 3
    assert result[0][2] == 'pau'
    assert result[1] == [0.1, 0.4, 'cat']
    assert result[2][2] == 'pau'


def test_tokenize_prompt():
    tokens = words.tokenize_prompt('The cat, sat - on "mats".')
    assert 'the' in tokens and 'cat' in tokens and 'mats' in tokens
    assert ',' not in tokens and '-' not in tokens


###############################################################################
# Phone+word merge -> TextGrid
###############################################################################


def test_align_from_sequence_data():
    phones = [[0.0, 0.1, 'pau'], [0.1, 0.2, 'k'], [0.2, 0.3, 'ae'],
              [0.3, 0.4, 't'], [0.4, 0.5, 'pau']]
    word_seq = [[0.1, 0.4, 'cat']]
    alignment = align.from_sequence_data(phones, word_seq)
    assert [str(w) for w in alignment.words()] == [SILENCE, 'cat', SILENCE]
    assert alignment.duration() == pytest.approx(0.5)
    assert [str(p) for p in alignment.phonemes()] == [
        SILENCE, 'k', 'ae', 't', SILENCE]


def test_align_merge_files_roundtrip(tmp_path):
    import csv

    phone_file = tmp_path / 'utt.csv'
    with open(phone_file, 'w') as f:
        writer = csv.writer(f)
        writer.writerow(['timestamp', 'phoneme'])
        writer.writerows([[0.1, 'pau'], [0.2, 'k'], [0.3, 'ae'],
                          [0.4, 't'], [0.5, 'pau']])
    word_dir = tmp_path / 'word'
    word_dir.mkdir()
    with open(word_dir / 'utt.csv', 'w') as f:
        writer = csv.writer(f)
        writer.writerow(['start', 'end', 'word'])
        writer.writerows([[0.1, 0.4, 'cat']])

    out_dir = tmp_path / 'out'
    align.from_files_to_files([phone_file], word_dir, out_dir)
    tg = out_dir / 'utt.TextGrid'
    assert tg.exists()
    parsed = textgrid.Alignment(tg)
    assert [str(p) for p in parsed.phonemes()] == [
        SILENCE, 'k', 'ae', 't', SILENCE]


###############################################################################
# Short-form TextGrid parsing (Charsiu Common Voice)
###############################################################################


SHORT_TEXTGRID = '''File type = "ooTextFile short"
"TextGrid"

0
0.5
<exists>
2
"IntervalTier"
"words"
0
0.5
2
0
0.25
"[SIL]"
0.25
0.5
"cat"
"IntervalTier"
"phones"
0
0.5
3
0
0.25
"[SIL]"
0.25
0.4
"K"
0.4
0.5
"AE"
'''


def test_short_textgrid_parse(tmp_path):
    path = tmp_path / 'short.TextGrid'
    path.write_text(SHORT_TEXTGRID)
    alignment = textgrid.Alignment(path)
    phones = list(alignment.phonemes())
    assert [str(p) for p in phones] == ['[SIL]', 'K', 'AE']
    assert phones[1].start == pytest.approx(0.25)
    assert alignment.duration() == pytest.approx(0.5)
    assert [str(w) for w in alignment.words()] == ['[SIL]', 'cat']


###############################################################################
# Arctic id mapping
###############################################################################


def test_version_90_to_95():
    from ppgs_tpu.data.datasets import arctic

    v90 = '( arctic_0001 "Hello there." )\n( arctic_0002 "Second one." )\n'
    v95 = '( arctic_a0001 "Hello there." )\n( arctic_a0002 "Second one." )\n'
    assert arctic.version_90_to_version_95(
        'arctic_0001', v90, v95) == 'arctic_a0001'
    assert arctic.version_90_to_version_95('arctic_0009', v90, v95) is None
