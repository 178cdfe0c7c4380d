"""User-facing storage layer: typed IO drivers + dotted-path interface.

Port of ``/root/reference/openmmtools/storage/`` (~2200 LoC): a
:class:`StorageIODriver` abstraction with per-type codecs and an appendable
iteration dimension, implemented over HDF5 (:class:`HDF5IODriver`; the
reference's NetCDFIODriver iodrivers.py:245 — netCDF4 is unavailable in this
environment and NetCDF4 files *are* HDF5 files), plus the lazy dotted-path
:class:`StorageInterface` (storageinterface.py:383):

>>> si = StorageInterface('analysis.h5')        # doctest: +SKIP
>>> si.energies.potential.write(123.4)          # doctest: +SKIP
>>> si.trajectory.positions.append(frame)       # doctest: +SKIP
"""

from openmmtools_tpu.storage.iodrivers import (
    HDF5IODriver,
    Quantity,
    StorageIODriver,
)
from openmmtools_tpu.storage.storageinterface import StorageInterface

NetCDFIODriver = HDF5IODriver  # API-parity alias

__all__ = ["StorageIODriver", "HDF5IODriver", "NetCDFIODriver",
           "StorageInterface", "Quantity"]
