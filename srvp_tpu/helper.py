"""Small helpers: attribute-style dicts and config file loading.

Capability parity with reference helper.py (/root/reference/helper.py:20-44).
"""

import json

import yaml


class DotDict(dict):
    """Dictionary whose entries are also reachable as attributes.

    Nested dicts are converted recursively so `cfg.model.ny` style access works.
    """

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        for key, value in self.items():
            if isinstance(value, dict) and not isinstance(value, DotDict):
                self[key] = DotDict(value)

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name, value):
        self[name] = value

    def __delattr__(self, name):
        try:
            del self[name]
        except KeyError as e:
            raise AttributeError(name) from e


def load_yaml(path):
    """Loads a YAML file into a DotDict."""
    with open(path, "r") as f:
        return DotDict(yaml.safe_load(f))


def load_json(path):
    """Loads a JSON file into a DotDict."""
    with open(path, "r") as f:
        return DotDict(json.load(f))


def save_json(obj, path):
    """Writes a JSON-serializable mapping to `path` (pretty-printed, sorted keys)."""
    with open(path, "w") as f:
        json.dump(obj, f, indent=2, sort_keys=True, default=str)
