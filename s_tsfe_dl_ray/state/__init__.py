from .gorilla import GorillaCodec  # noqa: F401
from .deltadelta import DeltaDeltaCodec  # noqa: F401
