#define VERSION "oracle"
