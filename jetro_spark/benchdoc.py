"""Deterministic bench_lock-style document generator.

Same structure/cardinalities as the reference benchmark workload
(jetro-core/examples/bench_lock.rs:48-137: N orders × M items, nested
customer.address, arithmetic series instead of RNG) so our document-mode
timings are apples-to-apples with BASELINE.md. Values are deterministic
functions of (i, j) — no randomness, stable across runs.
"""

from __future__ import annotations

import math

REGIONS = ["us-east", "us-west", "eu-central", "ap-southeast", "sa-south"]
STATUSES = ["pending", "shipped", "delivered", "cancelled", "refunded"]
PRIORITIES = ["low", "normal", "high", "urgent"]
CATEGORIES = ["electronics", "books", "apparel", "grocery", "toys", "tools"]
CITIES = ["Tokyo", "Berlin", "São Paulo", "Nairobi", "Austin", "Toronto"]
CCODES = ["JP", "DE", "BR", "KE", "US", "CA"]

BENCH_QUERIES = {
    # the 13 locked queries — BASELINE.md / bench_lock.rs:20-46
    "bl_q1": "$.orders.map(customer.address.city)",
    "bl_q2": "$.orders.map(customer.address.country_code).unique()",
    "bl_q3": "$.orders.filter(total > 500).map(id)",
    "bl_q4": '$.orders.filter(status == "shipped" and priority == "high").count()',
    "bl_q5": '$..find(@.status == "shipped")',
    "bl_q6": '$..find(@.sku == "SKU-00042")',
    "bl_q7": '$..find(@.status == "shipped", @.priority == "urgent")',
    "bl_q8": "$..total.sum()",
    "bl_q9": "$..sku",
    "bl_q10": "$.orders.group_by(status)",
    "bl_q11": "$.orders.map(total).sum()",
    "bl_q12": "$.orders.map(total).max()",
    "bl_q13": "[o.id for o in $.orders if o.total > 1000]",
}


def synth_doc(n_orders: int = 20_000, items_per_order: int = 6) -> dict:
    orders = []
    for i in range(n_orders):
        items = []
        total = 0.0
        for j in range(items_per_order):
            price = (i * 7 + j * 13) % 500 + 9.99
            qty = (i + j) % 5 + 1
            total += price * qty
            items.append({
                "sku": f"SKU-{(i * items_per_order + j) % 9973:05d}",
                "name": f"item-{i}-{j}",
                "category": CATEGORIES[(i + j) % len(CATEGORIES)],
                "price": price,
                "qty": qty,
            })
        orders.append({
            "id": 100_000 + i,
            "status": STATUSES[i % len(STATUSES)],
            "priority": PRIORITIES[(i // 3) % len(PRIORITIES)],
            "region": REGIONS[i % len(REGIONS)],
            "total": math.floor(total * 100 + 0.5) / 100,
            "customer": {
                "id": 10_000 + (i % 5000),
                "name": f"Customer {i % 5000}",
                "email": f"c{i % 5000}@example.com",
                "address": {
                    "city": CITIES[i % 6],
                    "zip": f"{(i * 17) % 100_000:05d}",
                    "country_code": CCODES[i % 6],
                },
            },
            "items": items,
        })
    return {"orders": orders, "meta": {"kind": "bench_lock", "version": 1}}
