"""PhotoModeler exported point tables and status reports.

References: code/file/loadpm3dtbl.m (3D point table with precisions),
code/file/loadpm2dtbl.m (2D mark/residual table),
code/file/loadpmreport.m (status report: EO values/deviations, totals).
These feed the external-verification workflows (prague2016 demos
compare DBAT results against PhotoModeler's own output).
"""

from __future__ import annotations

import csv
import re
from dataclasses import dataclass, field

import numpy as np


@dataclass
class Pm3dTable:
    id: np.ndarray
    name: list
    pos: np.ndarray  # (3,n)
    std: np.ndarray  # (3,n)
    rms: np.ndarray  # (n,)
    vis: np.ndarray  # (n_img_max, n) bool — photos (used)


@dataclass
class Pm2dTable:
    id: np.ndarray
    im_no: np.ndarray
    pos: np.ndarray  # (2,n) px
    res: np.ndarray  # (2,n) px residuals


@dataclass
class PmReport:
    eo: np.ndarray = None  # (n_img, 6) [X,Y,Z,omega,phi,kappa] rad
    eo_std: np.ndarray = None
    photo_labels: list = field(default_factory=list)
    n_iterations: int = -1
    first_error: float = np.nan
    last_error: float = np.nan
    status: str = ""


def _csv_rows(path):
    with open(path, "rt", newline="") as fh:
        header_found = False
        rd = csv.reader(fh)
        cols = None
        for row in rd:
            if not row:
                continue
            if not header_found:
                if row[0].strip() == "Id" or row[0].strip() == \
                        "Object Point ID":
                    cols = [c.strip() for c in row]
                    header_found = True
                continue
            yield cols, row


def load_pm_3d_tbl(path: str, smart: bool = False) -> Pm3dTable:
    ids, names, poss, stds, rmss, viss = [], [], [], [], [], []
    max_photo = 0
    for cols, row in _csv_rows(path):
        d = dict(zip(cols, row))
        ids.append(int(d["Id"]))
        names.append(d.get("Name", "").strip())
        poss.append([float(d[k]) for k in cols if k.startswith(("X (", "Y (", "Z ("))][:3])
        stds.append([float(d.get(k, "nan")) for k in
                     ("X Precision", "Y Precision", "Z Precision")])
        rmss.append(float(d.get("RMS Residual (pixels)", "nan") or "nan"))
        photos = [int(t) for t in d.get("Photos (used)", "").split(",")
                  if t.strip().isdigit()]
        viss.append(photos)
        if photos:
            max_photo = max(max_photo, max(photos))
    vis = np.zeros((max_photo, len(ids)), dtype=bool)
    for j, photos in enumerate(viss):
        for ph in photos:
            vis[ph - 1, j] = True
    return Pm3dTable(
        id=np.array(ids), name=names,
        pos=np.array(poss).T, std=np.array(stds).T,
        rms=np.array(rmss), vis=vis,
    )


def load_pm_2d_tbl(path: str) -> Pm2dTable:
    ids, ims, poss, ress = [], [], [], []
    for cols, row in _csv_rows(path):
        d = dict(zip(cols, row))
        ids.append(int(d["Object Point ID"]))
        ims.append(int(d["Photo #"]))
        poss.append([float(d["X (pixels)"]), float(d["Y (pixels)"])])
        ress.append([float(d.get("Residual X", "nan")),
                     float(d.get("Residual Y", "nan"))])
    return Pm2dTable(
        id=np.array(ids), im_no=np.array(ims),
        pos=np.array(poss).T, res=np.array(ress).T,
    )


def load_pm_report(path: str) -> PmReport:
    """Parse the EO section and totals of a PM status report
    (loadpmreport.m)."""
    rep = PmReport()
    txt = open(path, "rt", errors="replace").read()

    m = re.search(r"Number of Processing Iterations:\s*(\d+)", txt)
    if m:
        rep.n_iterations = int(m.group(1))
    m = re.search(r"First Error:\s*([\d.eE+-]+)", txt)
    if m:
        rep.first_error = float(m.group(1))
    m = re.search(r"Last Error:\s*([\d.eE+-]+)", txt)
    if m:
        rep.last_error = float(m.group(1))
    m = re.search(r"Status:\s*(\w+)", txt)
    if m:
        rep.status = m.group(1)

    # Photo blocks: "Photo N: label" followed by Omega/Phi/Kappa/Xc/Yc/Zc
    # each with Value/Deviation lines.
    photos = re.split(r"Photo (\d+): (\S+)", txt)
    eo_rows, std_rows, labels = [], [], []
    deg = np.pi / 180.0
    for k in range(1, len(photos) - 2, 3):
        label = photos[k + 1]
        body = photos[k + 2]
        vals = {}
        devs = {}
        for nm in ("Omega", "Phi", "Kappa", "Xc", "Yc", "Zc"):
            mv = re.search(nm + r"\s*\n\s*Value:\s*([-\d.eE+]+)", body)
            md = re.search(
                nm + r"\s*\n\s*Value:[^\n]*\n\s*Deviation:[^:]*:\s*([-\d.eE+]+)",
                body,
            )
            vals[nm] = float(mv.group(1)) if mv else np.nan
            devs[nm] = float(md.group(1)) if md else np.nan
        eo_rows.append([vals["Xc"], vals["Yc"], vals["Zc"],
                        vals["Omega"] * deg, vals["Phi"] * deg,
                        vals["Kappa"] * deg])
        std_rows.append([devs["Xc"], devs["Yc"], devs["Zc"],
                         devs["Omega"] * deg, devs["Phi"] * deg,
                         devs["Kappa"] * deg])
        labels.append(label)
    if eo_rows:
        rep.eo = np.array(eo_rows)
        rep.eo_std = np.array(std_rows)
        rep.photo_labels = labels
    return rep
