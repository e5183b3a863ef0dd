"""Project registry: the reference's pysemantic.conf surface on Spark.

API-compatible with pysemantic/project.py module functions (add_project,
remove_project, view_projects, get_projects, set_schema_fpath,
get_schema_specs, set_schema_specs, add_dataset, remove_dataset,
get_datasets) and the Project class (load_dataset / load_all /
export_dataset / view_dataset_specifications / reload_data_dict).

Registry format: INI file named ``pysemantic.conf``, one section per
project with a ``specfile`` key — located in cwd first, then $HOME,
exactly like the reference's locate_config_file (project.py ≈L30-60)."""

from __future__ import annotations

import configparser
import os

import yaml

from pysemantic_spark.errors import MissingConfigError, MissingProject
from pysemantic_spark.sources.readers import load_dataset as _load
from pysemantic_spark.spec import DatasetSpec, load_spec_file

CONF_FILE_NAME = "pysemantic.conf"


def locate_config_file() -> str:
    """cwd, then $HOME (reference order)."""
    for d in (os.getcwd(), os.path.expanduser("~")):
        p = os.path.join(d, CONF_FILE_NAME)
        if os.path.exists(p):
            return p
    raise MissingConfigError()


def _read_conf(path: str | None = None) -> tuple[configparser.ConfigParser, str]:
    p = path or locate_config_file()
    cp = configparser.ConfigParser()
    cp.read(p)
    return cp, p


def view_projects(config_path: str | None = None) -> list[tuple[str, str]]:
    cp, _ = _read_conf(config_path)
    return [(s, cp[s]["specfile"]) for s in cp.sections()]


get_projects = view_projects


def add_project(name: str, specfile: str, config_path: str | None = None) -> None:
    try:
        cp, p = _read_conf(config_path)
    except MissingConfigError:
        p = config_path or os.path.join(os.getcwd(), CONF_FILE_NAME)
        cp = configparser.ConfigParser()
    cp[name] = {"specfile": os.path.abspath(specfile)}
    with open(p, "w") as f:
        cp.write(f)


def remove_project(name: str, config_path: str | None = None) -> bool:
    cp, p = _read_conf(config_path)
    ok = cp.remove_section(name)
    with open(p, "w") as f:
        cp.write(f)
    return ok


def get_default_specfile(name: str, config_path: str | None = None) -> str:
    cp, _ = _read_conf(config_path)
    if not cp.has_section(name):
        raise MissingProject(f"project {name!r} not found in registry")
    return cp[name]["specfile"]


set_schema_fpath = add_project  # same effect: point project at a specfile


def get_schema_specs(project: str, dataset: str | None = None,
                     config_path: str | None = None):
    specfile = get_default_specfile(project, config_path)
    with open(specfile) as f:
        raw = yaml.safe_load(f) or {}
    return raw if dataset is None else raw.get(dataset)


def set_schema_specs(project: str, dataset: str, specs: dict,
                     config_path: str | None = None) -> None:
    specfile = get_default_specfile(project, config_path)
    with open(specfile) as f:
        raw = yaml.safe_load(f) or {}
    raw.setdefault(dataset, {}).update(specs)
    DatasetSpec.from_dict(dataset, raw[dataset])  # validate before persisting
    with open(specfile, "w") as f:
        yaml.safe_dump(raw, f)


def add_dataset(project: str, dataset: str, specs: dict,
                config_path: str | None = None) -> None:
    set_schema_specs(project, dataset, specs, config_path)


def remove_dataset(project: str, dataset: str,
                   config_path: str | None = None) -> bool:
    specfile = get_default_specfile(project, config_path)
    with open(specfile) as f:
        raw = yaml.safe_load(f) or {}
    found = dataset in raw
    raw.pop(dataset, None)
    with open(specfile, "w") as f:
        yaml.safe_dump(raw, f)
    return found


def get_datasets(project: str, config_path: str | None = None) -> list[str]:
    return sorted((get_schema_specs(project, config_path=config_path) or {}).keys())


class Project:
    """Reference: pysemantic/project.py :: Project."""

    def __init__(self, name: str, spark=None, config_path: str | None = None):
        self.name = name
        self._config_path = config_path
        self.specfile = get_default_specfile(name, config_path)
        self.specifications: dict[str, DatasetSpec] = load_spec_file(self.specfile)
        self._spark = spark

    @property
    def spark(self):
        if self._spark is None:
            from pysemantic_spark.session import get_spark

            self._spark = get_spark(app_name=f"pysemantic_spark:{self.name}")
        return self._spark

    @property
    def datasets(self) -> list[str]:
        return sorted(self.specifications)

    def reload_data_dict(self) -> None:
        self.specifications = load_spec_file(self.specfile)

    def view_dataset_specifications(self, dataset: str) -> DatasetSpec:
        self._require(dataset)
        return self.specifications[dataset]

    def load_dataset(self, dataset: str, clean: bool = True,
                     dims: dict | None = None):
        """Scan + (optionally) clean per the spec — the reference's main
        path: returns the cleaned DataFrame (lazy)."""
        self._require(dataset)
        spec = self.specifications[dataset]
        df = _load(self.spark, spec)
        if not clean:
            return df
        from pysemantic_spark.operators.runner import validate

        return validate(self.spark, df, spec, dims=dims or {}).clean

    def load_all(self, clean: bool = True) -> dict:
        return {d: self.load_dataset(d, clean=clean) for d in self.datasets}

    def validate_dataset(self, dataset: str, dims: dict | None = None, **kw):
        """Full ValidationResult (violations/stats/report/dupes)."""
        self._require(dataset)
        spec = self.specifications[dataset]
        df = _load(self.spark, spec)
        from pysemantic_spark.operators.runner import validate

        return validate(self.spark, df, spec, dims=dims or {}, **kw)

    def export_dataset(self, dataset: str, outpath: str, fmt: str = "csv",
                       clean: bool = True) -> None:
        """Reference: Project.export_dataset → CSV sink (debug scale);
        parquet for anything real."""
        df = self.load_dataset(dataset, clean=clean)
        writer = df.write.mode("overwrite")
        if fmt == "csv":
            writer.option("header", "true").csv(outpath)
        else:
            writer.format(fmt).save(outpath)

    def _require(self, dataset: str) -> None:
        if dataset not in self.specifications:
            raise MissingProject(
                f"dataset {dataset!r} not in project {self.name!r} "
                f"(have {self.datasets})"
            )
