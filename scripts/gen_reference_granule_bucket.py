#!/usr/bin/env python3
"""Generate the reference-layout GRANULE bucket fixture for the merge seam.

Replicates (with pandas/pyarrow, the same stack the reference writes with)
the on-disk layout the reference's write_granules_bucket produces in its
own test suite (satbucket/tests/test_routines.py:82-272):

  - hive-flavor spatial dirs `lon_bin=<label>/lat_bin=<label>` from a
    10x10-degree LonLatPartitioning (pd.cut labels = bin centroids,
    one decimal as rendered by the reference's float labels);
  - ONE parquet file per granule per touched partition, named
    `<granule filename stem>_0.parquet` (test_routines.py:184 expects
    os.path.splitext(f)[0] + "_0.parquet");
  - a `bucket_info.yaml` manifest;
  - pandas-default nanosecond timestamps, each granule's `time` column
    derived from the start_time encoded in its filename (the toy
    granule_to_df_func at test_routines.py:60-68).

Granules (the exact ids the reference merge tests use,
test_routines.py:281-285): two in 2021, one in 2023. The deterministic
toy swath below places points in lon [-10,10) x lat [0,20) so the
partition the reference asserts on (`lon_bin=-5.0/lat_bin=5.0`) exists.

Output: src/test/resources/reference_granule_src/
Consumed by ReferenceBucketInteropSpec's merge update-mode case.
"""
import os
import shutil

import numpy as np
import pandas as pd

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src/test/resources/reference_granule_src")

GRANULES = [
    # (filename, start_time)
    ("2A.GPM.DPR.V9-20211125.20210705-S013942-E031214.041760.V07A.HDF5",
     "2021-07-05 01:39:42"),
    ("2A.GPM.DPR.V9-20211125.20210805-S013942-E031214.041760.V07A.HDF5",
     "2021-08-05 01:39:42"),
    ("2A.GPM.DPR.V9-20211125.20230705-S013942-E031214.041760.V07A.HDF5",
     "2023-07-05 01:39:42"),
]


def toy_granule_df(start_time: str) -> pd.DataFrame:
    """Deterministic 50-point swath: 10 along-track x 5 cross-track, like
    the reference's toy granule (n_along_track=10, n_cross_track=5),
    diagonal (0,0)->(10,20) with cross-track spread pushing lon negative."""
    rng = np.random.RandomState(42)
    along = np.repeat(np.arange(10), 5)          # 0..9
    cross = np.tile(np.arange(5) - 2, 10)        # -2..2
    lon = along * (10.0 / 9.0) + cross * 3.7     # [-7.4, 17.4]
    lat = along * (20.0 / 9.0) + cross * 0.9     # [-1.8, 21.8]
    t0 = pd.Timestamp(start_time)
    time = t0 + pd.to_timedelta(along * 7, unit="s")
    return pd.DataFrame({
        "lon": lon, "lat": lat,
        "time": time,                             # pandas default: ns
        "dummy_var": rng.uniform(size=50),
    })


def centroid_label(v: float, size: float = 10.0) -> str:
    """pd.cut-style bin centroid label, one decimal (reference flavor)."""
    low = np.floor(v / size) * size
    return f"{low + size / 2.0:.1f}"


def main() -> None:
    if os.path.exists(OUT):
        shutil.rmtree(OUT)
    os.makedirs(OUT)
    for fname, start in GRANULES:
        df = toy_granule_df(start)
        df["lon_bin"] = df["lon"].map(centroid_label)
        df["lat_bin"] = df["lat"].map(centroid_label)
        stem = os.path.splitext(fname)[0]
        for (lo, la), part in df.groupby(["lon_bin", "lat_bin"]):
            d = os.path.join(OUT, f"lon_bin={lo}", f"lat_bin={la}")
            os.makedirs(d, exist_ok=True)
            part.drop(columns=["lon_bin", "lat_bin"]).to_parquet(
                os.path.join(d, f"{stem}_0.parquet"), index=False)
    with open(os.path.join(OUT, "bucket_info.yaml"), "w") as f:
        f.write("""class: LonLatPartitioning
extent:
- -180
- 180
- -90
- 90
size:
- 10
- 10
levels:
- lon_bin
- lat_bin
order:
- lon_bin
- lat_bin
flavor: hive
labels_decimals:
- 2
- 2
""")
    n = sum(len(fs) for _, _, fs in os.walk(OUT))
    print(f"wrote {OUT}: {n} files")


if __name__ == "__main__":
    main()
