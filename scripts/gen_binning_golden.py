#!/usr/bin/env python3
"""Regenerate src/test/resources/binning_golden.tsv.

Reproduces the REFERENCE semantics with the same libraries it uses
(numpy arange bounds + pd.cut right-closed include_lowest + np.round +
str()) over randomized configs. Dev tool only — the shipped library is
pure Scala/Spark.
"""
import numpy as np, pandas as pd, random

random.seed(20260812); np.random.seed(20260812)

def get_bounds(size, vmin, vmax):
    b = np.arange(vmin, vmax, size)
    if b[-1] != vmax: b = np.append(b, np.array([vmax]))
    return b

rows = []
sizes = [0.05, 0.1, 0.25, 0.5, 1.0, 1.5, 2.0, 2.5, 4.0, 5.0, 10.0]
for cfg in range(60):
    sx = random.choice(sizes)
    vmin = round(random.uniform(-180, 100) * 4) / 4
    vmax = vmin + random.choice([5, 10, 36, 90, 180])
    if cfg % 3 == 0:  # force a short last bin sometimes
        vmax = vmin + sx * random.randint(3, 40) + sx * 0.37
    bounds = get_bounds(sx, vmin, vmax)
    cents = (bounds[:-1] + bounds[1:]) / 2
    ss = repr(sx)
    dec = (len(ss) - ss.find('.') - 1 if '.' in ss else 0) + 1
    if cfg % 5 == 0: dec = 0  # exercise the int-cast label path
    vals = np.concatenate([
        np.random.uniform(vmin, vmax, 40),
        bounds[np.random.randint(0, len(bounds), 10)],  # exact edges
        [vmin, vmax, vmin - 1, vmax + 1, np.nan]])
    idx = pd.cut(vals.astype(float), bins=bounds, labels=False,
                 include_lowest=True, right=True)
    for v, i in zip(vals, idx):
        if np.isnan(i):
            rows.append((sx, vmin, vmax, dec, repr(float(v)), -1, "", ""))
        else:
            c = cents[int(i)]
            lv = np.round(c, dec)
            lab = str(lv.astype(int)) if dec == 0 else str(lv)
            rows.append((sx, vmin, vmax, dec, repr(float(v)), int(i),
                         repr(float(c)), lab))

with open('src/test/resources/binning_golden.tsv', 'w') as f:
    f.write("size\tvmin\tvmax\tdecimals\tvalue\tindex\tcentroid\tlabel\n")
    for r in rows:
        f.write("\t".join(str(x) for x in r) + "\n")
print(len(rows), "golden rows")
