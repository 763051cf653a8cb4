"""Framework version.

Parity: reference ``Version.txt`` + ``Mila::getAPIVersion()`` (Mila.ixx:247).
"""

__version__ = "0.1.0"

VERSION_MAJOR = 0
VERSION_MINOR = 1
VERSION_PATCH = 0


def get_api_version() -> str:
    """Return the semantic version string of the framework API."""
    return __version__
