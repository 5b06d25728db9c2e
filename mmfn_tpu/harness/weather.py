"""The weather preset table (base_agent.py:14-36).

One definition shared by the collection experts (which record the preset's
INDEX into each frame's measurements) and the CARLA glue (which applies the
preset by NAME via carla.WeatherParameters) — two copies would let recorded
weather ids silently desynchronize from the applied weather.
"""

WEATHER_PRESETS = (
    "ClearNoon", "ClearSunset", "CloudyNoon", "CloudySunset", "WetNoon",
    "WetSunset", "MidRainyNoon", "MidRainSunset", "WetCloudyNoon",
    "WetCloudySunset", "HardRainNoon", "HardRainSunset", "SoftRainNoon",
    "SoftRainSunset",
)
