"""Datasets: format-faithful loaders + registry + synthetic fallback.

Parity surface (reference ``data/dataset_3d.py``):
  - ModelNet10/40 (``:261-323``): pre-FPS'd pickle
    ``modelnet{K}_{split}_{npoints}pts_fps.dat``, per-item FPS down to
    npoints, unit-sphere normalization, class names from
    ``modelnet{K}_shape_names.txt``.
  - ScanObjectNN (``:389-422``): h5 files per variant
    (``obj_only``/``obj_bg``: ``{split}_objectdataset.h5``; ``hardest``:
    ``*_augmentedrot_scale75.h5``), truncation to npoints.
  - ModelNet_fs / ScanObjectNN_fs (``:326-467``): few-shot resampling of
    the train split, ``nshots`` per class, with replacement if scarce.
  - ShapeNetPart (``:656-760``): per-file txt clouds, split lists from
    ``train_test_split/*.json``, 16 categories / 50 part labels, random
    resample to npoints.
  - ShapeNet-55 (``:470-653``): ULIP pretraining triplets (npy clouds +
    caption templates from ``templates.json``).

All loaders produce plain numpy; batching/sharding happens in
``ppt_tpu.data.loader``; augmentation happens on device
(``ppt_tpu.data.augment``). Train-time per-item transforms that need
ragged host logic (ShapeNetPart resampling, ModelNet re-FPS) stay in the
loaders like the reference.

When the real files are absent (this build environment has none), tasks
fall back to :func:`make_synthetic` so every pipeline stays runnable
end-to-end.
"""

from __future__ import annotations

import dataclasses
import json
import os
import pickle
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np


# part-label spans per object category, index-aligned with the canonical
# 16-category ShapeNetPart ordering (reference ``category2part`` map,
# data/dataset_3d.py:719-729).
SHAPENETPART_CATEGORIES = [
    "Airplane", "Bag", "Cap", "Car", "Chair", "Earphone", "Guitar",
    "Knife", "Lamp", "Laptop", "Motorbike", "Mug", "Pistol", "Rocket",
    "Skateboard", "Table",
]
SHAPENETPART_PART_RANGES = np.array(
    [
        [0, 4], [4, 6], [6, 8], [8, 12], [12, 16], [16, 19], [19, 22],
        [22, 24], [24, 28], [28, 30], [30, 36], [36, 38], [38, 41],
        [41, 44], [44, 47], [47, 50],
    ],
    dtype=np.int32,
)
SHAPENETPART_NUM_PARTS = 50

# 50 part names used to build text prompts for partseg (category_part)
SHAPENETPART_PART_NAMES = [
    "airplane body", "airplane wing", "airplane tail", "airplane engine",
    "bag handle", "bag body",
    "cap panel", "cap peak",
    "car roof", "car hood", "car wheel", "car body",
    "chair back", "chair seat", "chair leg", "chair arm",
    "earphone earcup", "earphone headband", "earphone wire",
    "guitar head", "guitar neck", "guitar body",
    "knife blade", "knife handle",
    "lamp base", "lamp shade", "lamp bulb", "lamp tube",
    "laptop keyboard", "laptop screen",
    "motorbike wheel", "motorbike seat", "motorbike gas tank",
    "motorbike handle", "motorbike light", "motorbike frame",
    "mug handle", "mug body",
    "pistol barrel", "pistol handle", "pistol trigger",
    "rocket body", "rocket fin", "rocket nose",
    "skateboard wheel", "skateboard deck", "skateboard bar",
    "table top", "table leg", "table drawer",
]


def read_pcd(path: str) -> np.ndarray:
    """Uncompressed ``.pcd`` reader (ascii + binary), pure numpy.

    Parity surface: the reference reads ShapeNet clouds through
    ``utils/io.py:26-60`` (npy/pcd/h5/txt; the pcd branch delegates to
    open3d and supports uncompressed files only). open3d is absent here;
    this parses the PCD v0.7 header directly and returns the xyz
    columns as ``[N, 3]`` float, matching ``np.array(pc.points)``.
    """
    np_types = {
        ("F", 4): "f4", ("F", 8): "f8",
        ("I", 1): "i1", ("I", 2): "i2", ("I", 4): "i4",
        ("U", 1): "u1", ("U", 2): "u2", ("U", 4): "u4",
    }
    with open(path, "rb") as f:
        fields: List[str] = []
        sizes: List[int] = []
        types: List[str] = []
        counts: List[int] = []
        width = height = npts = 0
        mode = ""
        while True:
            raw = f.readline()
            if not raw:
                raise ValueError(f"{path}: truncated PCD header")
            line = raw.decode("ascii", "ignore").strip()
            if not line or line.startswith("#"):
                continue
            key, _, rest = line.partition(" ")
            key = key.upper()
            if key == "FIELDS":
                fields = rest.split()
            elif key == "SIZE":
                sizes = [int(v) for v in rest.split()]
            elif key == "TYPE":
                types = rest.split()
            elif key == "COUNT":
                counts = [int(v) for v in rest.split()]
            elif key == "WIDTH":
                width = int(rest)
            elif key == "HEIGHT":
                height = int(rest)
            elif key == "POINTS":
                npts = int(rest)
            elif key == "DATA":
                mode = rest.strip().lower()
                break
        npts = npts or width * height
        counts = counts or [1] * len(fields)
        dtype = np.dtype(
            [
                (name, np_types[(t, s)], (c,)) if c > 1
                else (name, np_types[(t, s)])
                for name, s, t, c in zip(fields, sizes, types, counts)
            ]
        )
        if mode == "ascii":
            flat = np.loadtxt(f, dtype=np.float64, ndmin=2)
            cols = {}
            off = 0
            for name, c in zip(fields, counts):
                cols[name] = flat[:, off] if c == 1 else flat[:, off:off + c]
                off += c
            xyz = np.stack([cols["x"], cols["y"], cols["z"]], axis=1)
        elif mode == "binary":
            rec = np.frombuffer(f.read(npts * dtype.itemsize), dtype=dtype)
            xyz = np.stack([rec["x"], rec["y"], rec["z"]], axis=1)
        else:
            raise ValueError(
                f"{path}: unsupported PCD DATA mode {mode!r} "
                "(ascii/binary only — same limit as the reference)"
            )
    return np.ascontiguousarray(xyz.astype(np.float64))


def read_cloud(path: str) -> np.ndarray:
    """Extension-dispatched cloud reader (``utils/io.py:26-60`` parity:
    npy/pcd/h5/txt)."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".npy":
        return np.load(path)
    if ext == ".pcd":
        return read_pcd(path)
    if ext == ".h5":
        import h5py

        with h5py.File(path, "r") as f:
            return f["data"][()]
    if ext == ".txt":
        return np.loadtxt(path)
    raise ValueError(f"Unsupported file extension: {ext}")


def pc_normalize(pc: np.ndarray) -> np.ndarray:
    """Unit-sphere normalize one cloud (``pc_normalize``, :33-40)."""
    centered = pc - pc.mean(axis=0)
    return centered / np.sqrt((centered**2).sum(axis=1)).max()


def fps_numpy(points: np.ndarray, npoint: int, seed: Optional[int] = None) -> np.ndarray:
    """Host-side FPS used by the ModelNet loader (``:41-61``)."""
    N = points.shape[0]
    xyz = points[:, :3]
    rng = np.random.RandomState(seed) if seed is not None else np.random
    out = np.zeros(npoint, dtype=np.int64)
    dist = np.full(N, 1e10)
    farthest = rng.randint(0, N)
    for i in range(npoint):
        out[i] = farthest
        d = ((xyz - xyz[farthest]) ** 2).sum(axis=1)
        dist = np.minimum(dist, d)
        farthest = int(np.argmax(dist))
    return points[out]


@dataclasses.dataclass
class ArrayDataset:
    """A fully-materialized dataset: fixed-shape numpy arrays + metadata."""

    points: np.ndarray  # [M, N, 3] float32 (normalized)
    labels: np.ndarray  # [M] int32 — class label (cls) or object category (partseg)
    classnames: List[str]
    seg_labels: Optional[np.ndarray] = None  # [M, N] int32 for partseg
    name: str = ""

    def __len__(self) -> int:
        return len(self.labels)

    @property
    def num_classes(self) -> int:
        return len(self.classnames)


def generate_fewshot(
    dataset: ArrayDataset, nshots: int, seed: int = 0
) -> ArrayDataset:
    """Sample ``nshots`` items per class, with replacement when a class is
    scarce (``generate_fewshot_dataset``, :210-240)."""
    rng = np.random.RandomState(seed)
    idx: List[int] = []
    for c in range(dataset.num_classes):
        pool = np.flatnonzero(dataset.labels == c)
        if len(pool) == 0:
            continue
        if len(pool) >= nshots:
            idx.extend(rng.choice(pool, nshots, replace=False))
        else:
            idx.extend(rng.choice(pool, nshots, replace=True))
    idx = np.asarray(idx)
    return ArrayDataset(
        points=dataset.points[idx],
        labels=dataset.labels[idx],
        classnames=dataset.classnames,
        seg_labels=None if dataset.seg_labels is None else dataset.seg_labels[idx],
        name=f"{dataset.name}_fs{nshots}",
    )


# ---------------------------------------------------------------------------
# Real-format loaders
# ---------------------------------------------------------------------------


def load_modelnet(
    root: str,
    split: str,
    npoints: int,
    num_category: int = 40,
    source_npoints: int = 8192,
) -> ArrayDataset:
    """ModelNet from the pre-FPS'd pickle (``ModelNet``, :261-323)."""
    catfile = os.path.join(root, f"modelnet{num_category}_shape_names.txt")
    with open(catfile) as f:
        classnames = [line.strip() for line in f if line.strip()]
    path = os.path.join(
        root, f"modelnet{num_category}_{split}_{source_npoints}pts_fps.dat"
    )
    with open(path, "rb") as f:
        list_of_points, list_of_labels = pickle.load(f)

    pts = np.zeros((len(list_of_labels), npoints, 3), dtype=np.float32)
    labels = np.zeros(len(list_of_labels), dtype=np.int32)

    # Re-FPS through the native C library when possible: the reference
    # runs a per-item numpy FPS loop at construction
    # (data/dataset_3d.py:294-300) — tens of minutes for ModelNet40 at
    # 8192->1024 on one core; ppt_fps_batch does the corpus in seconds.
    fps_batch_fn = None
    if any(npoints < np.asarray(p).shape[0] for p in list_of_points):
        try:
            from ppt_tpu.native import fps_batch as fps_batch_fn
        except Exception as e:  # pragma: no cover - build-env dependent
            import logging

            logging.getLogger(__name__).warning(
                "native fps unavailable (%s); using numpy FPS", e
            )

    by_size: Dict[int, List[int]] = {}
    for i, (p, l) in enumerate(zip(list_of_points, list_of_labels)):
        p = np.asarray(p, dtype=np.float32)
        labels[i] = int(l)
        if npoints >= p.shape[0]:
            pts[i] = pc_normalize(p[:, :3])
        elif fps_batch_fn is None:
            pts[i] = pc_normalize(fps_numpy(p, npoints)[:, :3])
        else:
            by_size.setdefault(p.shape[0], []).append(i)
    for _, idxs in by_size.items():
        stack = np.stack(
            [np.asarray(list_of_points[i], dtype=np.float32)[:, :3] for i in idxs]
        )
        sel = fps_batch_fn(stack, npoints)  # [M, npoints]
        for row, i in enumerate(idxs):
            pts[i] = pc_normalize(stack[row][sel[row]])
    return ArrayDataset(pts, labels, classnames, name=f"modelnet{num_category}")


def load_scanobjectnn(
    root: str, split: str, npoints: int, sonn_type: str = "hardest"
) -> ArrayDataset:
    """ScanObjectNN from h5 (``ScanObjectNN``, :389-422)."""
    import h5py  # gated: not needed unless real data is present

    if sonn_type == "hardest":
        path = os.path.join(
            root, sonn_type, f"{split}_objectdataset_augmentedrot_scale75.h5"
        )
    else:
        path = os.path.join(root, sonn_type, f"{split}_objectdataset.h5")
    with h5py.File(path, "r") as f:
        data = f["data"][:].astype(np.float32)
        labels = f["label"][:].astype(np.int32)
    with open(os.path.join(root, "shape_names.txt")) as f:
        classnames = [line.strip() for line in f if line.strip()]
    return ArrayDataset(
        data[:, :npoints, :3], labels, classnames, name=f"scanobjectnn_{sonn_type}"
    )


def load_shapenetpart(
    root: str, split: str, npoints: int, seed: int = 0
) -> ArrayDataset:
    """ShapeNetPart from per-file txt clouds (``ShapeNetPart``, :656-760).

    Clouds are unit-sphere normalized and randomly resampled (with
    replacement) to ``npoints``, matching the reference's __getitem__.
    """
    catfile = os.path.join(root, "synsetoffset2category.txt")
    cat: Dict[str, str] = {}
    with open(catfile) as f:
        for line in f:
            name, synset = line.strip().split()
            cat[name] = synset
    split_map = {"train": ["train"], "val": ["val"], "test": ["test"],
                 "trainval": ["train", "val"]}
    ids = set()
    for s in split_map[split]:
        with open(
            os.path.join(root, "train_test_split", f"shuffled_{s}_file_list.json")
        ) as f:
            ids |= {d.split("/")[2] for d in json.load(f)}

    rng = np.random.RandomState(seed)
    pts_list, cat_list, seg_list = [], [], []
    for ci, name in enumerate(SHAPENETPART_CATEGORIES):
        synset = cat[name]
        dir_point = os.path.join(root, synset)
        for fn in sorted(os.listdir(dir_point)):
            if os.path.splitext(fn)[0] not in ids:
                continue
            data = np.loadtxt(os.path.join(dir_point, fn)).astype(np.float32)
            pc = pc_normalize(data[:, :3])
            seg = data[:, -1].astype(np.int32)
            choice = rng.choice(len(seg), npoints, replace=True)
            pts_list.append(pc[choice])
            cat_list.append(ci)
            seg_list.append(seg[choice])
    return ArrayDataset(
        points=np.stack(pts_list),
        labels=np.asarray(cat_list, dtype=np.int32),
        classnames=list(SHAPENETPART_CATEGORIES),
        seg_labels=np.stack(seg_list),
        name="shapenetpart",
    )


def load_shapenet55(
    root: str,
    split: str,
    npoints: int,
    pc_dirname: str = "shapenet_pc",
    whole: bool = True,
    seed: int = 0,
) -> ArrayDataset:
    """ShapeNet-55 ULIP pretraining clouds (``ShapeNet``, :470-653).

    File list from ``{split}.txt`` entries ``taxonomy-model.npy`` (plus
    the test list when ``whole``); per-cloud random subsample to
    ``npoints`` and unit-sphere normalization. Labels index the taxonomy
    names from ``taxonomy.json`` (used to build captions at train time).
    """
    with open(os.path.join(root, "taxonomy.json")) as f:
        taxonomy = json.load(f)
    synset_names = {d["synsetId"]: d["name"].split(",")[0] for d in taxonomy}

    lines: List[str] = []
    with open(os.path.join(root, f"{split}.txt")) as f:
        lines += [line.strip() for line in f if line.strip()]
    if whole and split == "train":
        test_list = os.path.join(root, "test.txt")
        if os.path.exists(test_list):
            with open(test_list) as f:
                lines += [line.strip() for line in f if line.strip()]

    classnames: List[str] = []
    name_to_idx: Dict[str, int] = {}
    rng = np.random.RandomState(seed)
    pts = np.zeros((len(lines), npoints, 3), dtype=np.float32)
    labels = np.zeros(len(lines), dtype=np.int32)
    for i, line in enumerate(lines):
        synset = line.split("-")[0]
        name = synset_names.get(synset, synset)
        if name not in name_to_idx:
            name_to_idx[name] = len(classnames)
            classnames.append(name)
        data = read_cloud(os.path.join(root, pc_dirname, line)).astype(
            np.float32
        )
        if npoints < data.shape[0]:
            choice = rng.permutation(data.shape[0])[:npoints]
        else:
            choice = rng.randint(0, data.shape[0], npoints)
        pts[i] = pc_normalize(data[choice, :3])
        labels[i] = name_to_idx[name]
    return ArrayDataset(pts, labels, classnames, name="shapenet55")


# ---------------------------------------------------------------------------
# Synthetic fallback — keeps every task runnable without the real corpora
# ---------------------------------------------------------------------------


def make_synthetic(
    num_classes: int = 40,
    samples_per_class: int = 8,
    npoints: int = 1024,
    seed: int = 0,
    partseg: bool = False,
    classnames: Optional[Sequence[str]] = None,
) -> ArrayDataset:
    """Structured random clouds: each class is a distinct mixture of
    gaussian blobs so that learning is actually possible in smoke runs."""
    if partseg:
        # object categories live in the fixed 16-way ShapeNetPart space
        num_classes = min(num_classes, len(SHAPENETPART_CATEGORIES))
    rng = np.random.RandomState(seed)
    M = num_classes * samples_per_class
    pts = np.zeros((M, npoints, 3), dtype=np.float32)
    labels = np.zeros(M, dtype=np.int32)
    seg = np.zeros((M, npoints), dtype=np.int32) if partseg else None
    if classnames is None:
        if partseg:
            # full 16-category space: the partseg model conditions on a
            # 16-wide one-hot even when few categories have samples
            classnames = SHAPENETPART_CATEGORIES
        else:
            classnames = [f"shape {i}" for i in range(num_classes)]

    for c in range(num_classes):
        class_rng = np.random.RandomState(1000 + c)
        n_blobs = 2 + c % 4
        centers = class_rng.randn(n_blobs, 3)
        for s in range(samples_per_class):
            i = c * samples_per_class + s
            blob = rng.randint(0, n_blobs, npoints)
            pts[i] = centers[blob] * 0.5 + rng.randn(npoints, 3) * 0.15
            pts[i] = pc_normalize(pts[i])
            labels[i] = c
            if partseg:
                lo, hi = SHAPENETPART_PART_RANGES[c % 16]
                seg[i] = lo + blob % (hi - lo)
    return ArrayDataset(
        pts, labels, list(classnames), seg_labels=seg, name="synthetic"
    )


# ---------------------------------------------------------------------------
# Registry + catalog (Dataset_3D facade equivalent, :849-880)
# ---------------------------------------------------------------------------

DATASET_REGISTRY: Dict[str, Callable[..., ArrayDataset]] = {}


def register_dataset(name: str):
    def deco(fn):
        DATASET_REGISTRY[name] = fn
        return fn

    return deco


@register_dataset("modelnet40")
def _mn40(args, split: str) -> ArrayDataset:
    return load_modelnet(args.data_path, split, args.npoints, 40)


@register_dataset("modelnet10")
def _mn10(args, split: str) -> ArrayDataset:
    return load_modelnet(args.data_path, split, args.npoints, 10)


@register_dataset("scanobjectnn")
def _sonn(args, split: str) -> ArrayDataset:
    return load_scanobjectnn(args.data_path, split, args.npoints, args.sonn_type)


@register_dataset("shapenetpart")
def _snp(args, split: str) -> ArrayDataset:
    return load_shapenetpart(args.data_path, split, args.npoints)


@register_dataset("modelnet40_fs")
def _mn40_fs(args, split: str) -> ArrayDataset:
    ds = load_modelnet(args.data_path, split, args.npoints, 40)
    if split == "train":
        ds = generate_fewshot(ds, args.nshots, seed=args.seed)
    return ds


@register_dataset("modelnet10_fs")
def _mn10_fs(args, split: str) -> ArrayDataset:
    ds = load_modelnet(args.data_path, split, args.npoints, 10)
    if split == "train":
        ds = generate_fewshot(ds, args.nshots, seed=args.seed)
    return ds


@register_dataset("scanobjectnn_fs")
def _sonn_fs(args, split: str) -> ArrayDataset:
    ds = load_scanobjectnn(args.data_path, split, args.npoints, args.sonn_type)
    if split == "train":
        ds = generate_fewshot(ds, args.nshots, seed=args.seed)
    return ds


@register_dataset("shapenet")
def _sn55(args, split: str) -> ArrayDataset:
    return load_shapenet55(args.data_path, split, args.npoints)


@register_dataset("s3dis")
def _s3dis(args, split: str) -> ArrayDataset:
    from ppt_tpu.data.scenes import load_s3dis, materialize_crops

    scenes = load_s3dis(
        args.data_path, split, test_area=getattr(args, "test_area", 5),
        voxel_size=getattr(args, "voxel_size", 0.04),
    )
    return materialize_crops(
        scenes, voxel_max=getattr(args, "voxel_max", args.npoints),
        split=split, seed=getattr(args, "seed", 0),
    )


@register_dataset("scannetv2")
def _scannet(args, split: str) -> ArrayDataset:
    from ppt_tpu.data.scenes import load_scannetv2, materialize_crops

    scenes = load_scannetv2(args.data_path, split)
    return materialize_crops(
        scenes, voxel_max=getattr(args, "voxel_max", args.npoints),
        split=split, voxel_size=getattr(args, "voxel_size", 0.04),
        seed=getattr(args, "seed", 0),
    )


@register_dataset("semantic_kitti")
def _kitti(args, split: str) -> ArrayDataset:
    from ppt_tpu.data.scenes import load_semantic_kitti, materialize_crops

    scenes = load_semantic_kitti(args.data_path, split)
    return materialize_crops(
        scenes, voxel_max=getattr(args, "voxel_max", args.npoints),
        split=split, voxel_size=getattr(args, "voxel_size", 0.06),
        seed=getattr(args, "seed", 0),
    )


@register_dataset("matterport3d")
def _mp40(args, split: str) -> ArrayDataset:
    from ppt_tpu.data.scenes import load_mp40

    return load_mp40(args.data_path, split, args.npoints,
                     seed=getattr(args, "seed", 0))


@register_dataset("synthetic")
def _synth(args, split: str) -> ArrayDataset:
    return make_synthetic(
        num_classes=getattr(args, "num_classes", 40),
        samples_per_class=getattr(args, "samples_per_class", 8),
        npoints=args.npoints,
        seed=0 if split == "train" else 1,
        partseg=getattr(args, "task", "cls") == "partseg",
    )


def build_dataset(name: str, args, split: str) -> ArrayDataset:
    """Name -> dataset, with synthetic fallback when real files are
    missing (keeps the full pipeline exercisable in any environment)."""
    if name not in DATASET_REGISTRY:
        raise KeyError(f"unknown dataset {name!r}; have {sorted(DATASET_REGISTRY)}")
    try:
        return DATASET_REGISTRY[name](args, split)
    except (FileNotFoundError, ImportError, OSError) as e:
        if not getattr(args, "allow_synthetic_fallback", True):
            raise
        import logging

        logging.getLogger(__name__).warning(
            "dataset %s unavailable (%s); using synthetic fallback", name, e
        )
        return DATASET_REGISTRY["synthetic"](args, split)
