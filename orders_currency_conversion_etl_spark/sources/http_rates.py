"""HTTP exchange-rate / currency-list sources with a daily memo cache.

Mirrors the reference's OpenExchangeRates integration:
- rates fetch + error handling (reference:
  dags/order_currency_conversion_dag.py:44-56): non-200 raises, missing
  EUR raises;
- currency-list fetch (reference: dags/order_generator_dag.py:40-49);
- once-per-day caching in a tiny KV store (reference keeps it in an
  Airflow Variable keyed by date, order_currency_conversion_dag.py:33-42
  — here it's a driver-side JSON file, op S7).

The transport is injected (``fetch=``) so tests run a fake; the real
default uses urllib from the standard library. Network I/O stays on the
driver — rates are ~170 rows, broadcast after ``rates_df``.
"""

from __future__ import annotations

import datetime as dt
import json
import os
from collections.abc import Callable

from .rates import normalize_usd_rates_to_eur

Fetch = Callable[[str], dict]


def _default_fetch(url: str) -> dict:  # pragma: no cover - network
    import urllib.request

    with urllib.request.urlopen(url, timeout=30) as resp:
        if resp.status != 200:
            raise RuntimeError(f"Failed to fetch {url}: HTTP {resp.status}")
        return json.loads(resp.read().decode("utf-8"))


class DailyMemo:
    """date-keyed KV cache (the Airflow-Variable stand-in, op S7)."""

    def __init__(self, path: str):
        self.path = path

    def get(self, key: str, today: dt.date):
        if not os.path.exists(self.path):
            return None
        with open(self.path) as f:
            payload = json.load(f)
        entry = payload.get(key)
        if entry and entry.get("date") == today.isoformat():
            return entry["value"]
        return None

    def put(self, key: str, today: dt.date, value) -> None:
        payload = {}
        if os.path.exists(self.path):
            with open(self.path) as f:
                payload = json.load(f)
        payload[key] = {"date": today.isoformat(), "value": value}
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(payload, f)
        os.replace(tmp, self.path)


def get_exchange_rates(
    api_url: str,
    today: dt.date,
    memo: DailyMemo | None = None,
    fetch: Fetch = _default_fetch,
) -> dict[str, float]:
    """USD-base rates → EUR-base dict, memoized per day.

    Raises if the payload has no ``rates`` or no EUR entry — same
    failure contract as reference: ...conversion_dag.py:50-56."""
    if memo is not None:
        cached = memo.get("daily_exchange_rates", today)
        if cached is not None:
            return {k: float(v) for k, v in cached.items()}

    payload = fetch(api_url)
    usd_rates = payload.get("rates")
    if not usd_rates:
        raise ValueError("exchange-rate payload missing 'rates'")
    eur_rates = normalize_usd_rates_to_eur(usd_rates)

    if memo is not None:
        memo.put("daily_exchange_rates", today, eur_rates)
    return eur_rates


def get_currencies(
    api_url: str,
    today: dt.date,
    memo: DailyMemo | None = None,
    fetch: Fetch = _default_fetch,
) -> list[str]:
    """Currency-code list, memoized per day (reference:
    dags/order_generator_dag.py:40-55)."""
    if memo is not None:
        cached = memo.get("daily_currencies", today)
        if cached is not None:
            return list(cached)

    payload = fetch(api_url)
    if not payload:
        raise ValueError("currency payload empty")
    codes = sorted(payload)

    if memo is not None:
        memo.put("daily_currencies", today, codes)
    return codes
