"""Device discovery — GstDeviceMonitor / GstDeviceProvider equivalents.

Reference: subprojects/gstreamer/gst/gstdevicemonitor.c (1035),
gstdeviceprovider.c, gstdevice.c — providers register in the registry
with a factory rank; monitors filter providers by class string and caps
and enumerate Device objects that can create elements.

In the TPU deployment the interesting "devices" are the accelerator
chips (jax.devices()) and the host; providers enumerate them with caps
describing their compute role.  The API mirrors the reference so
tooling (device listings, auto-selection) ports directly.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional

from .caps import Caps
from .structure import Structure


@dataclass
class Device:
    """gst_device: display name, class string, caps, properties."""
    name: str
    device_class: str                  # e.g. "Compute/TPU", "Source/Video"
    caps: Caps
    properties: Dict = field(default_factory=dict)
    _create: Optional[Callable] = None

    def create_element(self, name: Optional[str] = None):
        """gst_device_create_element."""
        if self._create is None:
            raise NotImplementedError(f"{self.name}: no element factory")
        return self._create(name)

    def has_classes(self, classes: str) -> bool:
        """gst_device_has_classes: every '/'-separated class must match."""
        mine = self.device_class.split("/")
        return all(c in mine for c in classes.split("/") if c)


class DeviceProvider:
    """gst_device_provider: enumerates devices of one kind."""

    FACTORY = ""
    KLASS = ""

    def probe(self) -> List[Device]:
        raise NotImplementedError


_PROVIDERS: Dict[str, type] = {}


def register_device_provider(cls):
    _PROVIDERS[cls.FACTORY] = cls
    return cls


@register_device_provider
class TpuDeviceProvider(DeviceProvider):
    """Enumerates jax accelerator devices (the framework's equivalent of
    v4l2/pulse hardware providers)."""
    FACTORY = "tpudeviceprovider"
    KLASS = "Compute/TPU"

    def probe(self) -> List[Device]:
        import jax

        out = []
        for d in jax.devices():
            caps = Caps.from_string(
                f"compute/x-accelerator, platform={d.platform}, "
                f"id={d.id}")
            out.append(Device(
                name=f"{d.platform}:{d.id}",
                device_class=f"Compute/{d.platform.upper()}",
                caps=caps,
                properties={"device": d,
                            "memory_stats": getattr(d, "memory_stats",
                                                    lambda: {})},
            ))
        return out


@register_device_provider
class TestDeviceProvider(DeviceProvider):
    """Synthetic source devices (videotestsrc/audiotestsrc), mirroring
    how the reference ships a test provider for CI."""
    FACTORY = "testdeviceprovider"
    KLASS = "Source"

    def probe(self) -> List[Device]:
        from .element import element_factory_make

        def mk(factory):
            return lambda name=None: element_factory_make(factory,
                                                          name=name)

        return [
            Device("Video test source", "Source/Video",
                   Caps.from_string("video/x-raw"),
                   _create=mk("videotestsrc")),
            Device("Audio test source", "Source/Audio",
                   Caps.from_string("audio/x-raw"),
                   _create=mk("audiotestsrc")),
        ]


class DeviceMonitor:
    """gst_device_monitor: class/caps-filtered device enumeration."""

    def __init__(self):
        self._filters: List = []   # (classes | None, caps | None)
        self.started = False

    def add_filter(self, classes: Optional[str] = None,
                   caps: Optional[Caps] = None) -> int:
        self._filters.append((classes, caps))
        return len(self._filters)

    def start(self):
        self.started = True

    def stop(self):
        self.started = False

    def get_devices(self) -> List[Device]:
        devices: List[Device] = []
        for cls in _PROVIDERS.values():
            try:
                devices.extend(cls().probe())
            except Exception:
                continue
        if not self._filters:
            return devices
        out = []
        for d in devices:
            for classes, caps in self._filters:
                if classes and not d.has_classes(classes):
                    continue
                if caps is not None and not d.caps.can_intersect(caps):
                    continue
                out.append(d)
                break
        return out
