from .config import (read_yaml, dict2namespace, namespace2dict,
                     download_data_hf)
from .host import to_host

__all__ = ["read_yaml", "dict2namespace", "namespace2dict", "to_host"]
