"""Host-side format conversion and partition planning."""
from . import partition, sell, sell8w, dia, bcsr, coo2, reorder
