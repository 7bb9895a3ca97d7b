"""Network clock synchronization (libgstnet equivalent)."""

from .clock import (NetClientClock, NetTimePacket, NetTimeProvider,
                    SystemClock)

__all__ = ["NetTimePacket", "NetTimeProvider", "NetClientClock",
           "SystemClock"]
