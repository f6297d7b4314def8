# Registry submodules self-register on import (see registry.py bottom).
