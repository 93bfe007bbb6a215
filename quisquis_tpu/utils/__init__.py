"""Utilities: addresses, native bindings, metrics."""

from .address import Address, Network, AddressType  # noqa: F401
from .metrics import metrics, timed  # noqa: F401
