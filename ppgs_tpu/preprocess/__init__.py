from . import bottleneck, mel, spectrogram, w2v2fb, w2v2fc, w2v2ft
from . import encodec, dac
from .core import (
    datasets,
    from_audio,
    from_audios,
    from_dataloader,
    from_files_to_files,
    save_masked,
)


def get(representation: str):
    """Duck-typed frontend dispatch (reference: ppgs/core.py:333-336)."""
    import importlib

    try:
        return importlib.import_module(f'{__name__}.{representation}')
    except ImportError as error:
        raise ValueError(
            f'Unknown representation {representation}') from error
