#!/bin/sh
# Build the native prmtop parser (ctypes-consumed C ABI).
cd "$(dirname "$0")"
exec g++ -O2 -shared -fPIC -o libprmtop.so prmtop_parser.cpp
