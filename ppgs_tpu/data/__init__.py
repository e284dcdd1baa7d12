from . import audio, textgrid
from .collate import Collate
from .dataset import Dataset, Metadata
from .loader import Loader, loader
from .sampler import Sampler, SequentialSampler, sampler
