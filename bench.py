"""Benchmark: PPG inference throughput on the real chip.

Measures audio-seconds of speech processed per second per chip through the
full flagship pipelines (log-mel + 5-layer transformer, and the wav2vec2
feature-bottleneck pipeline), end to end on device. Prints one JSON line per
metric; the HEADLINE metric (mel_ppg_inference_throughput) is printed LAST:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Measurement is device-time by default: N pipeline applications are chained
inside ONE jitted program (a loop-carried scalar forces sequential
execution; N is a traced argument so both chain lengths share one compile)
and the per-application time is the slope fitted over two N — host
dispatch, tunnel latency, and any runtime result caching cancel exactly.
The raw dispatch-loop number (what a naive client observes, including
per-call host overhead) is reported alongside as "dispatch_value"; "mfu" is
the model-FLOPs utilization implied by the compiled program's own cost
analysis and the chip's bf16 peak.

Model parameters are passed as explicit jit ARGUMENTS, never closed over:
closed-over arrays embed as program constants, and wav2vec2-base's 380 MB
of constants exceeds the remote-compile tunnel's request size limit
(HTTP 413) in this environment.

The reference publishes no throughput numbers (BASELINE.md): the baseline is
parity-defined, so vs_baseline defaults to 1.0. The measured path is the
default config path (bf16 compute + Pallas whole-layer encoder kernels) —
what ppgs_tpu.from_audio actually runs; parity is enforced by tests/.

Env knobs:
  PPGS_BENCH_W2V2FB=0       skip the w2v2fb metric line (mel only)
  PPGS_BENCH_BUDGET_S=1200  wall-clock budget; later metrics are attempted
                            only while enough budget remains (cold compiles
                            over the device tunnel take minutes). Metric
                            lines STREAM as they complete, so an external
                            timeout truncates rather than losing results.
  PPGS_BENCH_FULL=1         also measure the XLA-only reference-numerics
                            path; report mel speedup over it in vs_baseline
"""

import json
import os
import sys
import time


# bf16 peak FLOP/s per chip by device_kind substring (best effort; MFU is
# omitted when the chip is unrecognized)
_PEAK_BF16 = [
    ('v6', 918e12), ('trillium', 918e12),
    ('v5p', 459e12),
    ('v5 lite', 197e12), ('v5e', 197e12),
    ('v4', 275e12),
    ('v3', 123e12),
    ('v2', 45e12),
]


def _peak_flops():
    import jax

    kind = jax.devices()[0].device_kind.lower()
    for key, peak in _PEAK_BF16:
        if key in kind:
            return peak
    return None


def main():
    t_start = time.time()
    budget = float(os.environ.get('PPGS_BENCH_BUDGET_S', 1200))

    import jax

    # Persistent compilation cache: device compiles ride a slow tunnel in
    # this environment (minutes); warm-cache reruns start in seconds.
    try:
        jax.config.update(
            'jax_compilation_cache_dir',
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         '.jax_cache'))
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np

    import ppgs_tpu
    from ppgs_tpu.models import transformer
    from ppgs_tpu.ops import stft as stft_ops

    config = ppgs_tpu.Config()
    mel_params = transformer.init(jax.random.PRNGKey(0), config)

    # Workload: 64 utterances x 8 s audio @16 kHz, generated on device
    # (host->device transfers are slow in this environment). EVERY timed
    # call gets an input batch no prior call (in this run or any previous
    # run) has seen: the remote runtime caches (executable, inputs) ->
    # result ACROSS PROCESSES, so fixed seeds eventually measure pure cache
    # lookups (~0.1 ms) instead of compute. Seed from the wall clock.
    B, seconds, n_inputs = 64, 8, 9
    S = seconds * config.sample_rate
    base_key = jax.random.PRNGKey(time.time_ns() & 0x7FFFFFFF)
    audios = [
        jax.random.normal(
            jax.random.fold_in(base_key, i), (B, 1, S), jnp.float32) * 0.1
        for i in range(n_inputs)
    ]
    jax.block_until_ready(audios)
    audio_seconds = B * seconds

    def mel_pipeline(p, audio):
        feats = stft_ops.log_mel_spectrogram(
            audio, config.sample_rate, config.num_fft, config.hopsize,
            config.window_size, config.num_mels, precision='default')
        lengths = jnp.full((audio.shape[0],), feats.shape[-1], jnp.int32)
        logits = transformer.chunked_forward(p, feats, lengths, config)
        return jax.nn.softmax(logits, axis=1)

    def timeit_dispatch(jfn, params, iters=6):
        """Wall clock of a host dispatch loop, every call on a distinct
        never-before-seen input: what a naive client observes (includes
        per-call host/tunnel overhead). audios[8] warms; [0..7] time."""
        jfn(params, audios[8]).block_until_ready()
        start = time.perf_counter()
        outs = [jfn(params, audios[i]) for i in range(iters)]
        jax.block_until_ready(outs)
        return (time.perf_counter() - start) / iters

    def timeit_chained(raw_fn, params, n1=3, n2=9):
        """Device-side time per pipeline application: chain N applications
        inside ONE jitted program (a loop-carried scalar forces sequential
        execution) and fit the slope over two N — dispatch/tunnel overheads
        cancel. N is traced, so both chain lengths share a single compiled
        while-loop program. Every timed call uses a DISTINCT (input, n)
        pair, so the runtime result cache can never serve one."""
        @jax.jit
        def many(p, audio, n):
            def body(i, acc):
                out = raw_fn(p, audio + acc * 1e-30)
                return out.mean().astype(audio.dtype)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))

        def run_n(n):
            many(params, audios[8], n).block_until_ready()   # warm/compile
            best = float('inf')
            # 2 timed repeats (min): each call is a full tunnel round trip
            # (~seconds when the relay is degraded) and the chained-slope
            # method already cancels dispatch noise
            for j in (5, 7):
                t0 = time.perf_counter()
                many(params, audios[j], n).block_until_ready()
                best = min(best, time.perf_counter() - t0)
            return best

        return (run_n(n2) - run_n(n1)) / (n2 - n1)

    def flops_of(jfn, params):
        try:
            analysis = (
                jfn.lower(params, audios[0]).compile().cost_analysis())
            if isinstance(analysis, list):
                analysis = analysis[0]
            return float(analysis['flops'])
        except Exception:
            return None

    peak = _peak_flops()

    def measure(raw_fn, params):
        """-> (device-time throughput, extras dict with dispatch-loop
        throughput, per-application device ms, and MFU when computable).

        Guards against a degraded remote runtime (observed failure mode:
        timings return instantly with nothing computed): one output VALUE
        is fetched to surface deferred errors, and any timing below half
        the speed-of-light floor implied by the program's own FLOP count
        is rejected. Falls back chained -> dispatch -> hard error rather
        than ever reporting a physically impossible number.
        """
        jfn = jax.jit(raw_fn)
        # Force one real execution end-to-end (value fetch surfaces
        # deferred execution errors that block_until_ready can miss)
        probe = jfn(params, audios[8])
        float(np.asarray(jax.device_get(probe)).ravel()[0])

        flops = flops_of(jfn, params)
        t_floor = (flops / peak) if (flops and peak) else 0.0

        def sane(t):
            return t > 0 and t >= 0.5 * t_floor

        t_device = timeit_chained(raw_fn, params)
        if not sane(t_device):
            t_device = timeit_chained(raw_fn, params)   # one retry
        t_dispatch = timeit_dispatch(jfn, params)

        extras = {}
        if sane(t_dispatch):
            extras['dispatch_value'] = round(audio_seconds / t_dispatch, 2)
        if sane(t_device):
            extras['device_ms_per_batch'] = round(t_device * 1e3, 3)
            if flops is not None and peak is not None:
                extras['mfu'] = round(flops / t_device / peak, 4)
            return audio_seconds / t_device, extras
        if sane(t_dispatch):
            extras['note'] = ('chained device-time slope invalid '
                              '(degraded runtime?); dispatch-loop value')
            return audio_seconds / t_dispatch, extras
        raise RuntimeError(
            f'both timings below the physical floor ({t_floor * 1e3:.2f} '
            f'ms for {flops} FLOPs): remote runtime degraded')

    # --- mel pipeline (headline metric; measured first, printed last) ------
    try:
        mel_value, mel_extras = measure(mel_pipeline, mel_params)
    except Exception as error:
        mel_value = 0.0
        mel_extras = {'error': f'{type(error).__name__}: {error}'}

    vs_baseline = 1.0
    if mel_value and os.environ.get('PPGS_BENCH_FULL'):
        # Additionally measure the XLA-only reference-numerics path
        # (Pallas kernels disabled) and report the speedup over it.
        # Adds a second multi-minute compile over the tunnel.
        os.environ['PPGS_TPU_DISABLE_FLASH'] = '1'
        try:
            xla_only = audio_seconds / timeit_chained(
                mel_pipeline, mel_params)
        finally:
            del os.environ['PPGS_TPU_DISABLE_FLASH']
        vs_baseline = mel_value / xla_only

    # Every metric line prints (and flushes) the moment it is measured —
    # a driver-side timeout then still records the completed metrics. The
    # headline line is printed FIRST (it is measured first) and RE-printed
    # last so last-line parsers see it.
    def _emit(record):
        lines.append(record)
        print(json.dumps(record))
        sys.stdout.flush()

    mel_headline = {
        'metric': 'mel_ppg_inference_throughput',
        'value': round(mel_value, 2),
        'unit': 'audio_seconds_per_second_per_chip',
        'vs_baseline': round(vs_baseline, 3),
        **mel_extras,
    }
    lines = []
    _emit(mel_headline)

    # --- w2v2fb pipeline (second BASELINE.md metric) -----------------------
    # Random-init wav2vec2-base weights: identical FLOPs/memory traffic to
    # the converted HF checkpoint (which is network-gated in CI). Attempted
    # only when enough wall-clock budget remains: its cold compile over the
    # tunnel takes minutes, and the headline mel line must always print.
    elapsed = time.time() - t_start
    if (os.environ.get('PPGS_BENCH_W2V2FB', '1') != '0'
            and elapsed < budget * 0.5):
        try:
            from ppgs_tpu.models import w2v2
            from ppgs_tpu.preprocess import w2v2fb as w2v2fb_mod

            w2v2fb_config = ppgs_tpu.config.REGISTRY['w2v2fb']
            w2v2fb_params = {
                'w2v2': w2v2.init(jax.random.PRNGKey(2)),
                'head': transformer.init(
                    jax.random.PRNGKey(3), w2v2fb_config),
            }
            out_frames = S // config.hopsize

            import dataclasses

            # The frontend's production dtype (bf16 matmuls + Pallas
            # packed-head attention; preprocess/w2v2fb.py passes the same)
            wcfg = dataclasses.replace(w2v2.BASE, compute_dtype='bfloat16')

            def w2v2fb_pipeline(p, audio):
                padded = jnp.pad(
                    audio,
                    ((0, 0), (0, 0), (w2v2fb_mod.PAD, w2v2fb_mod.PAD))
                ).squeeze(1)
                lengths = jnp.full((audio.shape[0],), padded.shape[-1],
                                   jnp.int32)
                hidden = w2v2.forward(p['w2v2'], padded, lengths, wcfg)
                # hidden.shape is static under jit; the index table traces
                # to a small constant
                idx = jnp.asarray(w2v2fb_mod.nearest_upsample_indices(
                    hidden.shape[1], out_frames))
                feats = hidden.transpose(0, 2, 1)[..., idx]
                feat_lengths = jnp.full((audio.shape[0],), out_frames,
                                        jnp.int32)
                logits = transformer.chunked_forward(
                    p['head'], feats, feat_lengths, w2v2fb_config)
                return jax.nn.softmax(logits, axis=1)

            value, extras = measure(w2v2fb_pipeline, w2v2fb_params)
            _emit({
                'metric': 'w2v2fb_ppg_inference_throughput',
                'value': round(value, 2),
                'unit': 'audio_seconds_per_second_per_chip',
                'vs_baseline': 1.0,
                **extras,
            })
        except Exception as error:
            _emit({
                'metric': 'w2v2fb_ppg_inference_throughput',
                'value': 0,
                'unit': 'audio_seconds_per_second_per_chip',
                'vs_baseline': 0.0,
                'error': f'{type(error).__name__}: {error}'})

    # --- training throughput (round-4 metric) ------------------------------
    # Full jitted train step (forward + masked CE + backward + Adam,
    # attention/FFN via the custom_vjp kernels; the common no-stats step —
    # gradient statistics run only on logging steps) at the reference's
    # MAX_TRAINING_FRAMES scale. Same chained-slope methodology; the
    # carried train state forces sequential execution.
    elapsed = time.time() - t_start
    if (os.environ.get('PPGS_BENCH_TRAIN', '1') != '0'
            and elapsed < budget * 0.65):
        try:
            from ppgs_tpu.train import core as train_core

            optimizer = train_core.make_optimizer(config)
            opt_state = optimizer.init(mel_params)
            step_fn = train_core.make_train_step(config, optimizer)

            Bt, Tt = 256, 512               # 131k frames ~ reference budget
            tkey = jax.random.PRNGKey((time.time_ns() >> 10) & 0x7FFFFFFF)
            tfeats = jax.random.normal(
                jax.random.fold_in(tkey, 0),
                (Bt, config.input_channels, Tt), jnp.float32)
            ttargets = jax.random.randint(
                jax.random.fold_in(tkey, 1), (Bt, Tt), 0,
                config.output_channels)
            tlengths = jnp.full((Bt,), Tt, jnp.int32)
            jax.block_until_ready((tfeats, ttargets))

            @jax.jit
            def many_steps(params, opt_state, feats, targets, lengths, n,
                           seed):
                rng = jax.random.PRNGKey(seed)

                def body(i, carry):
                    p, o = carry
                    p, o, _, _ = step_fn.__wrapped__(
                        p, o, feats, targets, lengths,
                        jax.random.fold_in(rng, i))
                    return p, o
                return jax.lax.fori_loop(0, n, body, (params, opt_state))

            salt = iter(range(time.time_ns() % 100000, 10 ** 9))

            def run_steps(n):
                jax.block_until_ready(many_steps(
                    mel_params, opt_state, tfeats, ttargets, tlengths, n,
                    next(salt)))
                best = float('inf')
                for _ in range(3):
                    t0 = time.perf_counter()
                    jax.block_until_ready(many_steps(
                        mel_params, opt_state, tfeats, ttargets, tlengths,
                        n, next(salt)))
                    best = min(best, time.perf_counter() - t0)
                return best

            dt = (run_steps(8) - run_steps(2)) / 6
            step_flops = None
            try:
                analysis = jax.jit(step_fn.__wrapped__).lower(
                    mel_params, opt_state, tfeats, ttargets, tlengths,
                    jax.random.PRNGKey(0)).compile().cost_analysis()
                if isinstance(analysis, list):
                    analysis = analysis[0]
                step_flops = float(analysis['flops'])
            except Exception:
                pass
            t_floor = (step_flops / peak) if (step_flops and peak) else 0.0
            if dt > 0 and dt >= 0.5 * t_floor:
                train_audio_s = Bt * Tt / config.frames_per_second
                record = {
                    'metric': 'mel_ppg_train_throughput',
                    'value': round(train_audio_s / dt, 2),
                    'unit': 'audio_seconds_per_second_per_chip',
                    'vs_baseline': 1.0,
                    'frames_per_step': Bt * Tt,
                    'device_ms_per_step': round(dt * 1e3, 3),
                }
                if step_flops is not None and peak is not None:
                    record['mfu'] = round(step_flops / dt / peak, 4)
                _emit(record)
            else:
                _emit({
                    'metric': 'mel_ppg_train_throughput', 'value': 0,
                    'unit': 'audio_seconds_per_second_per_chip',
                    'vs_baseline': 0.0,
                    'error': f'step-time slope {dt * 1e3:.3f} ms below '
                             f'physical floor {t_floor * 1e3:.3f} ms'})
        except Exception as error:
            _emit({
                'metric': 'mel_ppg_train_throughput', 'value': 0,
                'unit': 'audio_seconds_per_second_per_chip',
                'vs_baseline': 0.0,
                'error': f'{type(error).__name__}: {error}'})

    # --- bottleneck pipeline (round-5 metric; BASELINE "bottleneck config
    # variants") --------------------------------------------------------
    # Random-init 16-block d=144 conformer + PPG head: identical
    # FLOPs/memory traffic to the converted 24epoch.pth checkpoint
    # (network-gated). Budget-gated like w2v2fb.
    elapsed = time.time() - t_start
    if (os.environ.get('PPGS_BENCH_BOTTLENECK', '1') != '0'
            and elapsed < budget * 0.8):
        try:
            import dataclasses

            from ppgs_tpu.models import conformer as conformer_mod
            from ppgs_tpu.preprocess import bottleneck as bottleneck_mod

            bn_config = ppgs_tpu.config.REGISTRY['bottleneck']
            bn_params = {
                'conformer': conformer_mod.init(
                    jax.random.PRNGKey(4), conformer_mod.BOTTLENECK),
                'head': transformer.init(jax.random.PRNGKey(5), bn_config),
            }
            bn_cfg = dataclasses.replace(
                conformer_mod.BOTTLENECK, compute_dtype='bfloat16')
            bn_pad = bottleneck_mod.PAD

            def bottleneck_pipeline(p, audio):
                padded = jnp.pad(
                    audio, ((0, 0), (0, 0), (bn_pad, bn_pad))).squeeze(1)
                lengths = jnp.full((audio.shape[0],), padded.shape[-1],
                                   jnp.int32)
                feats, olens = bottleneck_mod.log_mel_power(padded, lengths)
                feats = bottleneck_mod.utterance_mvn(feats, olens)
                lat = conformer_mod.forward(p['conformer'], feats, olens,
                                            bn_cfg)
                logits = transformer.chunked_forward(
                    p['head'], lat.transpose(0, 2, 1),
                    olens.astype(jnp.int32), bn_config)
                return jax.nn.softmax(logits, axis=1)

            value, extras = measure(bottleneck_pipeline, bn_params)
            _emit({
                'metric': 'bottleneck_ppg_inference_throughput',
                'value': round(value, 2),
                'unit': 'audio_seconds_per_second_per_chip',
                'vs_baseline': 1.0,
                **extras,
            })
        except Exception as error:
            _emit({
                'metric': 'bottleneck_ppg_inference_throughput',
                'value': 0,
                'unit': 'audio_seconds_per_second_per_chip',
                'vs_baseline': 0.0,
                'error': f'{type(error).__name__}: {error}'})

    # --- causal variant (round-5 metric; BASELINE "causal_transformer") ----
    # Same mel pipeline under is_causal=True: rides the causal Pallas
    # whole-stack kernel; target within ~10% of the non-causal headline.
    elapsed = time.time() - t_start
    if (os.environ.get('PPGS_BENCH_CAUSAL', '1') != '0'
            and mel_value and elapsed < budget * 0.9):
        try:
            causal_config = ppgs_tpu.config.REGISTRY['causal_transformer']

            def causal_pipeline(p, audio):
                feats = stft_ops.log_mel_spectrogram(
                    audio, causal_config.sample_rate, causal_config.num_fft,
                    causal_config.hopsize, causal_config.window_size,
                    causal_config.num_mels, precision='default')
                lengths = jnp.full((audio.shape[0],), feats.shape[-1],
                                   jnp.int32)
                logits = transformer.chunked_forward(
                    p, feats, lengths, causal_config)
                return jax.nn.softmax(logits, axis=1)

            value, extras = measure(causal_pipeline, mel_params)
            extras['vs_noncausal'] = round(value / mel_value, 3)
            _emit({
                'metric': 'causal_mel_ppg_inference_throughput',
                'value': round(value, 2),
                'unit': 'audio_seconds_per_second_per_chip',
                'vs_baseline': 1.0,
                **extras,
            })
        except Exception as error:
            _emit({
                'metric': 'causal_mel_ppg_inference_throughput',
                'value': 0,
                'unit': 'audio_seconds_per_second_per_chip',
                'vs_baseline': 0.0,
                'error': f'{type(error).__name__}: {error}'})

    # Headline re-printed LAST for last-line parsers (already emitted
    # first; duplicate JSONL lines are harmless)
    print(json.dumps(mel_headline))
    sys.stdout.flush()


if __name__ == '__main__':
    main()
