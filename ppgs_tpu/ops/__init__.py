from . import algebra, filterbank, masking, stft
from .algebra import distance, interpolate, sparsify
from .masking import mask_from_lengths
