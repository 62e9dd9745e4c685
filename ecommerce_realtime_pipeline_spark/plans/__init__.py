"""Analytics query plans (the reference's declared KPI workload, R13-R24)."""
