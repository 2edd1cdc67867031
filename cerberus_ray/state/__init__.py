from .hll import HyperLogLog  # noqa: F401
from .bloom import BloomFilter  # noqa: F401
from .countmin import CountMinSketch  # noqa: F401
from .tdigest import TDigest  # noqa: F401
from .kll import KLL  # noqa: F401
