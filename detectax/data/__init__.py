from detectax.data.pipeline import Loader  # noqa: F401
from detectax.data.synthetic import SyntheticDataset  # noqa: F401
