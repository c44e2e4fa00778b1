"""Device execution plans: XLA lowerings and Pallas kernels."""
from . import xla_csr
