from skred_tpu.host.engine import HostEngine  # noqa: F401
from skred_tpu.host.wire import WireContext  # noqa: F401
