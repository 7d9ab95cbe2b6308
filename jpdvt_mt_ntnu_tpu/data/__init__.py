from .transforms import center_crop_arr, normalize, to_array  # noqa: F401
from .datasets import (  # noqa: F401
    ImageFolderDataset,
    METDataset,
    SyntheticPuzzles,
    TEXMETDataset,
)
from .loader import Loader  # noqa: F401
