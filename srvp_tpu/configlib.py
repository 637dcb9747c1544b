"""A small configargparse-compatible argument parser.

The reference uses configargparse (/root/reference/args.py:16,36); that
package is not a baked-in dependency here, so this shim provides the subset
the CLIs need: `.add()` aliases, argument groups and mutually exclusive
groups with `.add()`, default-value help formatting, and an optional
`--config <json|yaml>` file whose entries become argument defaults.
"""

import argparse


def _augment_group(group):
    """Gives an argparse group configargparse's `.add` alias (recursively for
    mutually exclusive subgroups)."""
    group.add = group.add_argument
    orig_mex = group.add_mutually_exclusive_group

    def add_mutually_exclusive_group(**kwargs):
        return _augment_group(orig_mex(**kwargs))

    group.add_mutually_exclusive_group = add_mutually_exclusive_group
    return group


class ArgumentParser(argparse.ArgumentParser):
    def __init__(self, *args, formatter_class=argparse.ArgumentDefaultsHelpFormatter,
                 **kwargs):
        kwargs.pop("default_config_files", None)
        super().__init__(*args, formatter_class=formatter_class, **kwargs)
        self.add_argument(
            "--config", type=str, default=None, metavar="FILE",
            help="Optional JSON/YAML file providing default values for any flag.")

    def add(self, *args, **kwargs):
        self.add_argument(*args, **kwargs)

    def add_argument_group(self, *args, **kwargs):
        return _augment_group(super().add_argument_group(*args, **kwargs))

    def parse_args(self, args=None, namespace=None):
        # Two-phase parse: pick up --config (with required-ness suspended),
        # apply file values as defaults, then parse normally so CLI flags
        # override the file.
        saved_required = [(a, a.required) for a in self._actions]
        for a in self._actions:
            a.required = False
        try:
            pre, _ = super().parse_known_args(args)
        finally:
            for a, r in saved_required:
                a.required = r
        if getattr(pre, "config", None):
            path = pre.config
            if path.endswith((".yaml", ".yml")):
                import yaml
                with open(path) as f:
                    values = yaml.safe_load(f)
            else:
                import json
                with open(path) as f:
                    values = json.load(f)
            by_dest = {a.dest: a for a in self._actions}
            unknown = set(values) - set(by_dest)
            if unknown:
                self.error(f"unknown keys in config file: {sorted(unknown)}")
            # Apply each action's type converter and choices validation, as
            # configargparse does for file-sourced values — `lr: "3e-4"` must
            # become a float, `beta_z: 2` the float the CLI path would
            # produce, and `archi: vggg` must fail here, not deep in model
            # construction. YAML booleans are only legal for flag actions
            # (store_true/store_false): `lr: true` would otherwise coerce to
            # 1.0 silently.
            flag_actions = (argparse._StoreTrueAction, argparse._StoreFalseAction,
                            argparse.BooleanOptionalAction)
            for key in list(values):
                action, val = by_dest[key], values[key]
                if val is None:
                    continue
                if isinstance(val, bool):
                    if not isinstance(action, flag_actions):
                        self.error(
                            f"config file key {key!r}: boolean {val} is not a "
                            f"valid value for a {action.type or str} flag")
                    continue
                if action.type is not None:
                    try:
                        if isinstance(val, list):
                            val = [action.type(v) for v in val]
                        else:
                            val = action.type(val)
                    except (TypeError, ValueError) as e:
                        self.error(f"config file key {key!r}: {e}")
                    values[key] = val
                if action.choices is not None:
                    for v in val if isinstance(val, list) else [val]:
                        if v not in action.choices:
                            self.error(
                                f"config file key {key!r}: invalid choice "
                                f"{v!r} (choose from "
                                f"{', '.join(map(repr, action.choices))})")
            # Mutually exclusive groups: file-sourced values bypass argparse's
            # presence tracking, so enforce here (a value counts as "given"
            # unless it is None or False — matching store_true semantics).
            for grp in self._mutually_exclusive_groups:
                given = [a for a in grp._group_actions
                         if values.get(a.dest) not in (None, False)]
                if len(given) > 1:
                    names = ", ".join(a.option_strings[0] for a in given)
                    self.error(f"config file sets mutually exclusive flags: {names}")
            self.set_defaults(**values)
            # Required flags satisfied by the config file are no longer required.
            for a in self._actions:
                if a.dest in values:
                    a.required = False
        return super().parse_args(args, namespace)


# configargparse API aliases
ArgParser = ArgumentParser
ArgumentDefaultsHelpFormatter = argparse.ArgumentDefaultsHelpFormatter
