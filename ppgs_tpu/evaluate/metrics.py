"""Evaluation metrics (reference: ppgs/evaluate/metrics.py:14-414).

Pure functional design: metric state is a flat dict of scalar/vector arrays;
``update_state`` is one jit-compiled function computing every metric's batch
contribution at once (sums only, so states psum across hosts/devices
trivially). Figures (confusion / distance matrices) render host-side from the
accumulated tensors.
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import config as config_mod
from ..ops import algebra
from ..phonemes import PHONEMES


TOP_K = 3


def init_state(num_classes: int = 40):
    """Zeroed metric accumulators."""
    z = jnp.zeros
    return {
        'count': z((), jnp.int64 if jax.config.x64_enabled else jnp.int32),
        'true_positives': z(()),
        'top_k_correct': z(()),
        'jsd_total': z(()),
        'loss_total': z(()),
        'class_totals': z((num_classes,)),
        'class_counts': z((num_classes,)),
        'confusion': z((num_classes, num_classes)),
        # Probability-mass confusion: row target, summed softmax probs
        # (reference ConfusionMatrix, metrics.py:275-299)
        'prob_confusion': z((num_classes, num_classes)),
        # Weighted distance matrix: row weighted-argmax prediction,
        # summed weighted probs (reference DistanceMatrix, :370-414)
        'distance_matrix': z((num_classes, num_classes)),
    }


@functools.partial(jax.jit, static_argnames=('class_weights_none',))
def _update(state, logits, targets, similarity, class_weights,
            distance_weights, class_weights_none=True):
    """Accumulate all metrics for one batch.

    logits: (B, C, T) raw model outputs; targets: (B, T) with -100 padding.
    """
    num_classes = logits.shape[1]
    # (B*T, C) / (B*T,)
    flat_logits = logits.transpose(0, 2, 1).reshape(-1, num_classes)
    flat_logits = flat_logits.astype(jnp.float32)
    flat_targets = targets.reshape(-1)
    valid = flat_targets != -100
    safe_targets = jnp.where(valid, flat_targets, 0)

    count = valid.sum()
    predicted = flat_logits.argmax(axis=-1)

    # Framewise accuracy
    correct = (predicted == flat_targets) & valid
    true_positives = correct.sum()

    # Top-k accuracy
    kth = jnp.sort(flat_logits, axis=-1)[:, num_classes - TOP_K]
    target_logit = jnp.take_along_axis(
        flat_logits, safe_targets[:, None], axis=-1)[:, 0]
    in_top_k = (target_logit >= kth) & valid
    top_k_correct = in_top_k.sum()

    # Per-class totals/counts + confusion matrix
    pred_onehot = jax.nn.one_hot(predicted, num_classes) * valid[:, None]
    target_onehot = jax.nn.one_hot(safe_targets, num_classes) * valid[:, None]
    class_totals = (pred_onehot * target_onehot).sum(axis=0)
    class_counts = target_onehot.sum(axis=0)
    confusion = target_onehot.T @ pred_onehot

    # Cross-entropy loss (sum), matching ppgs.loss(reduction='sum')
    log_probs = jax.nn.log_softmax(flat_logits, axis=-1)
    nll = -jnp.take_along_axis(log_probs, safe_targets[:, None], axis=-1)[:, 0]
    if not class_weights_none:
        nll = nll * class_weights[safe_targets]
    loss_total = jnp.where(valid, nll, 0.0).sum()

    # Jensen-Shannon pronunciation distance vs one-hot targets
    probs = jax.nn.softmax(flat_logits, axis=-1)
    jsd = _jsd_sum(probs, target_onehot, valid, similarity)

    # Probability-mass confusion (target row += probs)
    masked_probs = probs * valid[:, None]
    prob_confusion = target_onehot.T @ masked_probs

    # Weighted distance matrix (weighted-argmax row += weighted probs);
    # the reference always weights by the asset phoneme weights
    weighted = probs * distance_weights[None, :]
    weighted_pred = weighted.argmax(axis=-1)
    pred_w_onehot = jax.nn.one_hot(weighted_pred, num_classes) \
        * valid[:, None]
    distance_matrix = pred_w_onehot.T @ (weighted * valid[:, None])

    return {
        'count': state['count'] + count,
        'true_positives': state['true_positives'] + true_positives,
        'top_k_correct': state['top_k_correct'] + top_k_correct,
        'jsd_total': state['jsd_total'] + jsd,
        'loss_total': state['loss_total'] + loss_total,
        'class_totals': state['class_totals'] + class_totals,
        'class_counts': state['class_counts'] + class_counts,
        'confusion': state['confusion'] + confusion,
        'prob_confusion': state['prob_confusion'] + prob_confusion,
        'distance_matrix': state['distance_matrix'] + distance_matrix,
    }


def _jsd_sum(probs, target_onehot, valid, similarity, exponent=1.2):
    """Summed normalized JSD between rows of probs and one-hot targets
    (reference JensenShannon.update -> ppgs.distance(reduction='sum'))."""
    x = jnp.clip(probs, 1e-8, 1 - 1e-8)
    y = jnp.clip(target_onehot, 1e-8, 1 - 1e-8)
    weight = similarity.T ** exponent          # (C, C)
    x = x @ weight.T                           # rows: weight @ x_row
    y = y @ weight.T
    log_average = jnp.log((x + y) / 2)
    kl_x = x * (jnp.log(x) - log_average)
    kl_y = y * (jnp.log(y) - log_average)
    average_kl = jnp.maximum((kl_x + kl_y) / 2, 0.0)
    jsd = jnp.sqrt(average_kl).sum(axis=-1)
    return jnp.where(valid, jsd, 0.0).sum()


class Metrics:
    """Stateful wrapper with the reference's dict-of-scalars interface."""

    def __init__(self, include_figures: bool = False, config=None):
        self.config = config_mod.get(config)
        self.include_figures = include_figures
        self.similarity = algebra.similarity_matrix()
        if self.config.class_balanced:
            from .. import load as load_mod

            self.class_weights = load_mod.phoneme_weights(self.config)
        else:
            self.class_weights = jnp.zeros((self.config.output_channels,))
        # Distance-matrix weighting always uses the asset phoneme weights
        try:
            import numpy as _np

            from .. import config as _config_mod

            self.distance_weights = jnp.asarray(
                _np.load(_config_mod.CLASS_WEIGHT_FILE)['weights'])
        except (FileNotFoundError, OSError):
            self.distance_weights = jnp.ones(
                (self.config.output_channels,))
        self.reset()

    def reset(self):
        self.state = init_state(self.config.output_channels)

    def update(self, predicted_logits, target_indices):
        self.state = _update(
            self.state, jnp.asarray(predicted_logits),
            jnp.asarray(target_indices), self.similarity,
            self.class_weights, self.distance_weights,
            class_weights_none=not self.config.class_balanced)

    def __call__(self):
        s = jax.device_get(self.state)
        count = max(float(s['count']), 1.0)
        results = {
            'Accuracy': float(s['true_positives']) / count,
            f'Top-{TOP_K} Accuracy/': float(s['top_k_correct']) / count,
            'JSD': float(s['jsd_total']) / count,
            'loss': float(s['loss_total']) / count,
        }
        for i, phoneme in enumerate(PHONEMES):
            denom = max(float(s['class_counts'][i]), 1.0)
            results[f'Accuracy/{phoneme}'] = float(
                s['class_totals'][i]) / denom
            results[f'Total/{phoneme}'] = float(s['class_totals'][i])
            results[f'Count/{phoneme}'] = float(s['class_counts'][i])
        if self.include_figures:
            results['ConfusionMatrix'] = self.confusion_figure(
                np.asarray(s['prob_confusion']))
            results['DistanceMatrix'] = self.distance_figure(
                np.asarray(s['distance_matrix']))
        return results

    @staticmethod
    def confusion_figure(confusion):
        """Probability-mass confusion figure (reference metrics.py:255-270)."""
        import matplotlib

        matplotlib.use('Agg')
        from matplotlib import pyplot as plt

        row_sums = confusion.sum(axis=1, keepdims=True)
        normalized = confusion / np.maximum(row_sums, 1e-12)
        figure, axis = plt.subplots(figsize=(6, 6), dpi=200)
        axis.matshow(normalized)
        axis.set_xticks(range(len(PHONEMES)))
        axis.set_yticks(range(len(PHONEMES)))
        axis.set_xticklabels(PHONEMES, rotation='vertical', fontsize=5)
        axis.set_yticklabels(PHONEMES, fontsize=5)
        axis.set_ylabel('Ground Truth Phoneme')
        axis.set_xlabel('Model Predicted Probabilities')
        return figure

    @staticmethod
    def distance_figure(matrix):
        """Weighted distance-matrix figure with PowerNorm render and
        f/v, s/z, sh/zh highlight boxes (reference metrics.py:301-364)."""
        import matplotlib

        matplotlib.use('Agg')
        from matplotlib.colors import PowerNorm
        from matplotlib import pyplot as plt

        row_sums = matrix.sum(axis=1, keepdims=True)
        normalized = matrix / np.maximum(row_sums, 1e-12)
        figure, axis = plt.subplots(figsize=(6, 6), dpi=200)
        image = axis.matshow(normalized, norm=PowerNorm(gamma=1 / 3))
        axis.set_xticks(range(len(PHONEMES)))
        axis.set_yticks(range(len(PHONEMES)))
        axis.set_xticklabels(PHONEMES, rotation='vertical', fontsize=5)
        axis.set_yticklabels(PHONEMES, fontsize=5)
        figure.colorbar(image, ax=axis, fraction=0.046)

        padding = 0.7
        for phone0, phone1 in [('f', 'v'), ('s', 'z'), ('sh', 'zh')]:
            idx0, idx1 = PHONEMES.index(phone0), PHONEMES.index(phone1)
            for cx, cy in [(idx0, idx1), (idx1, idx0)]:
                axis.add_patch(plt.Rectangle(
                    (cx - padding, cy - padding), 2 * padding, 2 * padding,
                    facecolor='none', edgecolor='red', linewidth=0.5))
        return figure
