"""ppgs_tpu: TPU-native phonetic posteriorgram framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the
reference `interactiveaudiolab/ppgs` (PyTorch, single GPU): training,
inference, evaluation, and editing of high-fidelity neural phonetic
posteriorgrams — built for TPU meshes.
"""

from . import config
from .config import Config
from .phonemes import (
    PHONEMES,
    PHONEME_TO_INDEX_MAPPING,
    NUM_PHONEMES,
    VOICED,
    CHARSIU_PERMUTE,
    TIMIT_TO_ARCTIC_MAPPING,
    SILENCE,
)
from . import ops
from .ops import distance, interpolate, sparsify
from . import models
from . import edit
from . import convert
from . import frontend
from . import load
from . import parallel
from . import preprocess
from .core import (
    from_audio,
    from_dataloader,
    from_features,
    from_file,
    from_file_to_file,
    from_files_to_files,
    infer,
    resample,
    representation_file_extension,
)
from . import data
from . import evaluate
from . import partition
from . import plot
from .train import loss

__version__ = '0.1.0'
