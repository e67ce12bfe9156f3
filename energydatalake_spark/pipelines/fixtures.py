"""Deterministic synthetic ERCOT/weather fixtures (FIXTURES.md).

Generates the six source tables the reference ingests, as CSV files
with PRE-normalization headers ("Interval Start", not interval_start)
so the rename operator is genuinely exercised, plus the edge cases
FIXTURES.md requires: nulls, exact duplicate rows, malformed
timestamps, as-of tie/backward/before-all cases, band-join boundary
hits and misses.

Seeded and pure-numpy — same bytes every run.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

ZONES = ["LZ_HOUSTON", "LZ_WEST", "LZ_SOUTH", "LZ_NORTH"]
START = pd.Timestamp("2024-03-01 00:00:00")

FM_SOURCES = [
    "Coal and Lignite",
    "Hydro",
    "Nuclear",
    "Power Storage",
    "Solar",
    "Wind",
    "Natural Gas",
    "Other",
]


def _write_csvs(df: pd.DataFrame, folder: str, n_files: int = 3) -> None:
    """Split into several CSVs — the sources are folder-of-files queues
    (SURVEY.md §1.1) and multi-file scans must be exercised."""
    os.makedirs(folder, exist_ok=True)
    for i, chunk in enumerate(np.array_split(np.arange(len(df)), n_files)):
        df.iloc[chunk].to_csv(os.path.join(folder, f"part{i}.csv"), index=False)


def gen_fuel_mix(rng: np.random.Generator, n_ticks: int = 96) -> pd.DataFrame:
    t = START + pd.to_timedelta(np.arange(n_ticks) * 5, unit="m")
    hours = np.asarray(t.hour) + np.asarray(t.minute) / 60
    solar = np.clip(np.sin((hours - 6) / 12 * np.pi), 0, None) * 12000
    df = pd.DataFrame(
        {
            "Time": t.strftime("%Y-%m-%d %H:%M:%S"),
            "Interval Start": t.strftime("%Y-%m-%d %H:%M:%S"),
            "Interval End": (t + pd.Timedelta(minutes=5)).strftime("%Y-%m-%d %H:%M:%S"),
            "Coal and Lignite": rng.uniform(5000, 12000, n_ticks).round(2),
            "Hydro": rng.uniform(0, 600, n_ticks).round(2),
            "Nuclear": np.full(n_ticks, 5000.0) + rng.normal(0, 20, n_ticks).round(2),
            "Power Storage": rng.normal(0, 300, n_ticks).round(2),
            "Solar": (solar + rng.normal(0, 100, n_ticks)).clip(0).round(2),
            "Wind": rng.uniform(2000, 15000, n_ticks).round(2),
            "Natural Gas": rng.uniform(10000, 30000, n_ticks).round(2),
            "Other": rng.uniform(0, 300, n_ticks).round(2),
        }
    )
    # nulls in measures (F1/A2 must see nonzero counts)
    df.loc[df.index[::17], "Hydro"] = None
    # a malformed timestamp (P3 -> null -> dropped)
    df.loc[df.index[7], "Time"] = "not-a-timestamp"
    # exact duplicate rows (F2)
    return pd.concat([df, df.iloc[[3, 10]]], ignore_index=True)


def gen_load(rng: np.random.Generator, n_ticks: int = 96) -> pd.DataFrame:
    # Different cadence than fuel_mix (FIXTURES.md §2): 5-min grid shifted
    # +2 min, so most joins are backward (non-exact); a few ticks aligned
    # exactly on the fuel_mix grid to exercise the tie case; and one row
    # before all fuel_mix rows (dropped downstream by dropna).
    t = START + pd.to_timedelta(np.arange(n_ticks) * 5 + 2, unit="m")
    tie_idx = [10, 40]
    t = t.to_series().reset_index(drop=True)
    for i in tie_idx:
        t.iloc[i] = START + pd.Timedelta(minutes=i * 5)  # exact fuel_mix tick
    t.iloc[0] = START - pd.Timedelta(hours=1)  # before all left rows
    hours = np.asarray(pd.DatetimeIndex(t).hour)
    load = 45000 + 15000 * np.sin((hours - 4) / 24 * 2 * np.pi) + rng.normal(0, 800, n_ticks)
    df = pd.DataFrame(
        {
            "Time": pd.DatetimeIndex(t).strftime("%Y-%m-%d %H:%M:%S"),
            "Interval Start": pd.DatetimeIndex(t).strftime("%Y-%m-%d %H:%M:%S"),
            "Interval End": (pd.DatetimeIndex(t) + pd.Timedelta(minutes=5)).strftime(
                "%Y-%m-%d %H:%M:%S"
            ),
            "Load": load.round(2),
        }
    )
    df.loc[df.index[::23], "Load"] = None
    return pd.concat([df, df.iloc[[5]]], ignore_index=True)


def gen_load_forecast(rng: np.random.Generator, n_hours: int = 72) -> pd.DataFrame:
    t = START + pd.to_timedelta(np.arange(n_hours), unit="h")
    frames = []
    for vintage in range(2):  # several publish vintages per target hour
        pub = START - pd.Timedelta(hours=6 * (vintage + 1))
        zones = {
            z: rng.uniform(8000, 20000, n_hours).round(2)
            for z in ("North", "South", "West", "Houston")
        }
        df = pd.DataFrame(
            {
                "Time": t.strftime("%Y-%m-%d %H:%M:%S"),
                "Interval Start": t.strftime("%Y-%m-%d %H:%M:%S"),
                "Interval End": (t + pd.Timedelta(hours=1)).strftime("%Y-%m-%d %H:%M:%S"),
                "Publish Time": pub.strftime("%Y-%m-%d %H:%M:%S"),
                **zones,
            }
        )
        df["System Total"] = (
            df["North"] + df["South"] + df["West"] + df["Houston"]
        ).round(2)
        frames.append(df)
    out = pd.concat(frames, ignore_index=True)
    out.loc[out.index[::31], "West"] = None
    return out


def gen_spp(rng: np.random.Generator, n_intervals: int = 48) -> pd.DataFrame:
    # 15-min intervals with explicit -06:00 offsets (spp feed stringifies
    # timestamps with offsets — ercot_spp_csv.py:28-30).
    rows = []
    for i in range(n_intervals):
        s = START + pd.Timedelta(minutes=15 * i)
        e = s + pd.Timedelta(minutes=15)
        for z in ZONES:
            spike = 1000.0 if (i == 20 and z == "LZ_WEST") else 0.0
            rows.append(
                {
                    "Location": z,
                    "SPP": round(float(rng.uniform(10, 200)) + spike, 2),
                    "Time": e.strftime("%Y-%m-%d %H:%M:%S-06:00"),
                    "Interval Start": s.strftime("%Y-%m-%d %H:%M:%S-06:00"),
                    "Interval End": e.strftime("%Y-%m-%d %H:%M:%S-06:00"),
                }
            )
    return pd.DataFrame(rows)


def gen_weather_live(rng: np.random.Generator, n_pulls: int = 40) -> pd.DataFrame:
    rows = []
    for i in range(n_pulls):
        # Mostly inside some spp interval; a few strictly outside (before
        # the first interval) for band-join negatives. Boundary cases:
        # pull 0 exactly on an interval start, pull 1 exactly on an end.
        if i == 0:
            ts = START
        elif i == 1:
            ts = START + pd.Timedelta(minutes=15)
        elif i % 13 == 0:
            ts = START - pd.Timedelta(hours=2, minutes=i)
        else:
            ts = START + pd.Timedelta(minutes=int(rng.integers(0, 48 * 15)))
        for z in ZONES:
            temp = float(rng.uniform(40, 95))
            rows.append(
                {
                    "Location": z,
                    "Temperature": round(temp, 2),
                    "Temp_min": round(temp - float(rng.uniform(0, 5)), 2),
                    "Temp_max": round(temp + float(rng.uniform(0, 5)), 2),
                    "Pressure": round(float(rng.uniform(1000, 1030)), 2),
                    "Humidity": round(float(rng.uniform(0, 100)), 2),
                    "Wind Speed": round(float(rng.uniform(0, 30)), 2),
                    "Date": ts.strftime("%Y-%m-%d %H:%M:%S-06:00"),
                }
            )
    return pd.DataFrame(rows)


def gen_weather_historical(rng: np.random.Generator, n_hours: int = 168) -> dict[str, pd.DataFrame]:
    """One frame per zone — written as one CSV per zone to exercise the
    multi-file union path (mergeHistoricalWeather.py:33-44)."""
    coords = {
        "LZ_HOUSTON": (29.76, -95.37),
        "LZ_WEST": (31.99, -102.08),
        "LZ_SOUTH": (27.80, -97.40),
        "LZ_NORTH": (32.78, -96.80),
    }
    t = START + pd.to_timedelta(np.arange(n_hours), unit="h")
    out = {}
    for z in ZONES:
        lat, lon = coords[z]
        df = pd.DataFrame(
            {
                "zone": z,
                "latitude": lat,
                "longitude": lon,
                "date": t.strftime("%Y-%m-%d %H:%M:%S"),
                "temperature_2m": rng.uniform(5, 40, n_hours).round(2),
                "relative_humidity_2m": rng.uniform(10, 100, n_hours).round(2),
                "dew_point_2m": rng.uniform(0, 25, n_hours).round(2),
                "precipitation": np.where(rng.random(n_hours) < 0.9, 0.0, rng.uniform(0, 8, n_hours)).round(2),
                "rain": 0.0,
                "snowfall": 0.0,
                "cloud_cover": rng.uniform(0, 100, n_hours).round(2),
                "cloud_cover_low": rng.uniform(0, 100, n_hours).round(2),
                "cloud_cover_mid": rng.uniform(0, 100, n_hours).round(2),
                "cloud_cover_high": rng.uniform(0, 100, n_hours).round(2),
                "wind_speed_10m": rng.uniform(0, 60, n_hours).round(2),
                "wind_speed_100m": rng.uniform(0, 80, n_hours).round(2),
                "wind_direction_10m": rng.uniform(0, 360, n_hours).round(2),
                "wind_direction_100m": rng.uniform(0, 360, n_hours).round(2),
                "wind_gusts_10m": rng.uniform(0, 90, n_hours).round(2),
            }
        )
        df.loc[df.index[::29], "dew_point_2m"] = None
        out[z] = df
    return out


def generate_all(base_dir: str, seed: int = 42) -> dict[str, str]:
    """Write every fixture folder under base_dir; returns name→folder."""
    rng = np.random.default_rng(seed)
    layout = {
        "fuel_mix": os.path.join(base_dir, "ercot_fm_csv", "fm_latest"),
        "load_latest": os.path.join(base_dir, "ercot_load_csv", "load_latest"),
        "load_forecast": os.path.join(base_dir, "ercot_load_forecast_csv"),
        "spp": os.path.join(base_dir, "ercot_spp_csv", "spp_latest"),
        "weather_live": os.path.join(base_dir, "openweather_live_data", "quarter_hourly_weather_data"),
        "weather_historical": os.path.join(base_dir, "openmeteo-weather", "hourly-historical-weather-data"),
    }
    _write_csvs(gen_fuel_mix(rng), layout["fuel_mix"])
    _write_csvs(gen_load(rng), layout["load_latest"])
    _write_csvs(gen_load_forecast(rng), layout["load_forecast"])
    _write_csvs(gen_spp(rng), layout["spp"])
    _write_csvs(gen_weather_live(rng), layout["weather_live"])
    os.makedirs(layout["weather_historical"], exist_ok=True)
    for z, df in gen_weather_historical(rng).items():
        df.to_csv(os.path.join(layout["weather_historical"], f"{z}.csv"), index=False)
    return layout
