"""Host-side format conversion and partition planning."""
from . import partition, sell
