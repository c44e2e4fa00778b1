"""Device execution plans: XLA lowerings and Pallas kernels."""
from . import xla_csr, pallas_sell, pallas_coo2
