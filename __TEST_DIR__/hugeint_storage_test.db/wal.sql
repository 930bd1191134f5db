CREATE TABLE hugeints (h HUGEINT);;
CREATE TABLE hugeints (h HUGEINT);;
